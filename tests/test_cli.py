"""End-to-end CLI tests on a tiny synthetic dataset: preprocess →
train → test → multifuture inference → evaluators (the full reference
workflow per TRAINING.md / TESTING.md, at toy scale on CPU)."""

import json
import os
import pickle

import numpy as np
import pytest

from tests.synthetic import (
    tiny_config,
    write_multifuture_dataset,
    write_reference_format_dataset,
)

MODEL_FLAGS = [
    "--obs_len", "4", "--pred_len", "5",
    "--scene_h", "12", "--scene_w", "16", "--scene_class", "5",
    "--emb_size", "8", "--enc_hidden_size", "16",
    "--dec_hidden_size", "16", "--scene_conv_dim", "8",
    "--scene_grid_strides", "2,4", "--use_grids", "1,0",
    "--use_gnn", "--use_scene_enc",
]


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(7)
    cfg = tiny_config()
    traj_path, scene_path, id2name = write_reference_format_dataset(
        str(root), cfg, rng, num_videos=2, frames_per_video=20)
    return dict(root=str(root), cfg=cfg, traj_path=traj_path,
                scene_path=scene_path, id2name=id2name,
                rng=rng)


@pytest.fixture(scope="module")
def prepro(workdir):
    from multiverse_tpu.cli import preprocess

    out = os.path.join(workdir["root"], "prepro")
    preprocess.main([
        workdir["traj_path"], out,
        "--obs_len", "4", "--pred_len", "5",
        "--add_grid", "--add_all_reg", "--add_scene",
        "--scene_feat_path", workdir["scene_path"],
        "--scene_id2name", workdir["id2name"],
        "--direct_scene_feat",
        "--scene_h", "12", "--scene_w", "16",
        "--grid_strides", "2,4",
    ])
    assert os.path.exists(os.path.join(out, "data_train.npz"))
    return out


@pytest.fixture(scope="module")
def trained(workdir, prepro):
    from multiverse_tpu.cli import train

    outbase = os.path.join(workdir["root"], "models")
    train.main([
        prepro, outbase, "toy", "--runId", "1",
        "--batch_size", "4", "--num_epochs", "2",
        "--save_period", "5", "--init_lr", "0.3",
        *MODEL_FLAGS,
    ])
    outpath = os.path.join(outbase, "toy", "01")
    assert os.path.exists(os.path.join(outpath, "config.json"))
    assert os.path.isdir(os.path.join(outpath, "save"))
    assert os.path.isdir(os.path.join(outpath, "best"))
    assert os.path.exists(os.path.join(outpath, "val_perf.json"))
    return outbase


def test_train_artifacts(trained, workdir):
    outpath = os.path.join(trained, "toy", "01")
    with open(os.path.join(outpath, "val_perf.json")) as f:
        perf = json.load(f)
    assert perf["best"]["step"] > 0


def test_test_cli(trained, prepro, workdir, capsys):
    from multiverse_tpu.cli import test as test_cli

    save_out = os.path.join(workdir["root"], "test_out.p")
    test_cli.main([
        prepro, trained, "toy", "--runId", "1", "--load_best",
        "--batch_size", "4", "--save_output", save_out,
        *MODEL_FLAGS,
    ])
    printed = capsys.readouterr().out.strip().splitlines()
    names, numbers = printed[-2].split(), printed[-1].split()
    perf = dict(zip(names, (float(x) for x in numbers)))
    assert "grid0_traj_ade" in perf
    assert perf["grid0_traj_ade"] > 0
    assert os.path.exists(save_out)
    with open(save_out, "rb") as f:
        data = pickle.load(f)
    assert "grid0_pred_traj" in data and "seq_ids" in data


def test_test_cli_summary_flags(trained, prepro, capsys):
    """--show_center_only / --show_grid_acc_at_T widen the key-metric
    summary lines exactly like the reference (code/test.py:158-170):
    acc/ADE/FDE always, the center-only ablation and the per-T
    accuracies only behind their flags (T entries beyond pred_len are
    silently absent, as in the reference's `if k in key_metrics`)."""
    from multiverse_tpu.cli import test as test_cli

    base = [prepro, trained, "toy", "--runId", "1", "--load_best",
            "--batch_size", "4", *MODEL_FLAGS]

    test_cli.main(base)
    names = capsys.readouterr().out.strip().splitlines()[-2].split()
    assert "grid0_traj_ade" in names and "grid0_acc" in names
    assert not any("centerOnly" in k or "@T=" in k for k in names)

    test_cli.main(base + ["--show_center_only", "--show_grid_acc_at_T"])
    out = capsys.readouterr().out.strip().splitlines()
    names = out[-2].split()
    # the EMITTED key name (the reference's own filter spells it
    # centerOnly_traj and so never matches — fixed here, see cli/test.py)
    assert "grid0_traj_centerOnly_ade" in names
    # pred_len=5: T=0 and T=4 exist, the reference's T=9/11 don't
    assert "grid0_acc_@T=4" in names
    assert "grid0_acc_@T=9" not in names
    # every metric still appears as its own "key, value" line above
    assert any(line.startswith("grid0_acc_@T=1,") for line in out)


def test_train_simaug_cli(workdir, prepro):
    from multiverse_tpu.cli import train_simaug

    outbase = os.path.join(workdir["root"], "models_simaug")
    train_simaug.main([
        prepro, outbase, "simaug_toy", "--runId", "0",
        "--batch_size", "4", "--num_epochs", "1",
        "--save_period", "9", "--init_lr", "0.3",
        "--multiview_train", "--multiview_exp", "3",
        "--multiview_max_num", "2", "--adv_use_fgsm",
        "--use_mixup", "--double_weighting",
        *MODEL_FLAGS,
    ])
    outpath = os.path.join(outbase, "simaug_toy", "00")
    assert os.path.exists(os.path.join(outpath, "val_perf.json"))
    with open(os.path.join(outpath, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["multiview_train"] is True


def test_train_resume_from_checkpoint(trained, prepro, workdir):
    """--load restores the best/latest params and continues training
    (reference: code/train.py:38-43, pred_utils.initialize — optimizer
    slots and step excluded, like the reference's var filtering).
    New checkpoints must land ABOVE the previous run's steps — the
    SAME --save_period as the first run would otherwise collide
    (orbax StepAlreadyExistsError) or number below the stale run so a
    later --load restores pre-resume weights."""
    from multiverse_tpu.cli import train
    from multiverse_tpu.train.checkpoints import CheckpointManager

    outpath = os.path.join(trained, "toy", "01")
    before = CheckpointManager(outpath).latest_step()
    assert before is not None and before > 0

    train.main([
        prepro, trained, "toy", "--runId", "1", "--load",
        "--batch_size", "4", "--num_epochs", "1",
        "--save_period", "5", "--init_lr", "0.3",   # SAME period
        *MODEL_FLAGS,
    ])
    with open(os.path.join(outpath, "val_perf.json")) as f:
        perf = json.load(f)
    assert perf["best"]["step"] > 0
    after = CheckpointManager(outpath).latest_step()
    assert after > before, (before, after)
    # the loaded model's validation baseline was recorded before any
    # training step (reference is_start branch, code/train.py:216-219)
    assert perf["val_perf"][0][0] is None


def test_restore_scale_subset(tmp_path):
    """A checkpoint trained with --use_grids 1,1 restores into a
    --use_grids 1,0 consumer (the reference's own published flow:
    TESTING.md trains both scales, every test/inference command
    activates scale 0 only — its TF loader scope-filters; ours prunes
    the restored tree to the template)."""
    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.models import init_params
    from multiverse_tpu.train.checkpoints import (
        CheckpointManager,
        restore_params_from,
    )

    base = dict(
        obs_len=4, pred_len=5, scene_h=12, scene_w=16, scene_class=5,
        emb_size=8, enc_hidden_size=16, dec_hidden_size=16,
        scene_conv_dim=8, scene_grid_strides=(2, 4))
    cfg_both = MultiverseConfig(
        use_grids=(True, True), **base).validate()
    cfg_one = MultiverseConfig(
        use_grids=(True, False), **base).validate()
    params = init_params(jax.random.PRNGKey(0), cfg_both)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(1, jax.device_get(params))

    tpl = init_params(jax.random.PRNGKey(1), cfg_one)
    restored = restore_params_from(str(tmp_path / "save"), tpl)
    assert sorted(restored["scales"]) == ["0"]
    np.testing.assert_array_equal(
        restored["scales"]["0"]["enc_class"]["kernel"],
        np.asarray(params["scales"]["0"]["enc_class"]["kernel"]))
    # a template needing a scale the checkpoint lacks still fails loud
    tpl_both = init_params(jax.random.PRNGKey(2), cfg_both)
    ckpt2 = CheckpointManager(str(tmp_path / "one"))
    ckpt2.save(1, jax.device_get(init_params(jax.random.PRNGKey(3),
                                             cfg_one)))
    with pytest.raises((KeyError, ValueError)):
        restore_params_from(str(tmp_path / "one" / "save"), tpl_both)


def test_test_cli_beam_mode(trained, prepro, workdir, capsys):
    """mvt-test with beam search saves beam ids/logprobs in the output
    pickle (reference: code/pred_utils.py:379-394,519-531)."""
    from multiverse_tpu.cli import test as test_cli

    save_out = os.path.join(workdir["root"], "test_out_beam.p")
    test_cli.main([
        prepro, trained, "toy", "--runId", "1", "--load_best",
        "--batch_size", "4", "--save_output", save_out,
        "--use_beam_search", "--beam_size", "3",
        "--diverse_beam", "--diverse_gamma", "0.01",
        *MODEL_FLAGS,
    ])
    capsys.readouterr()
    with open(save_out, "rb") as f:
        data = pickle.load(f)
    assert "beam_grid_ids" in data and "beam_logprobs" in data
    ids = np.asarray(data["beam_grid_ids"][0])
    assert ids.shape[0] == 3  # [K, T]
    lp = np.asarray(data["beam_logprobs"][0])
    assert lp.shape == (3,) and np.isfinite(lp).all()


def test_multifuture_pipeline(trained, workdir, capsys):
    from multiverse_tpu.cli import (
        multifuture_eval_trajs,
        multifuture_eval_trajs_prob,
        multifuture_inference,
    )

    rng = workdir["rng"]
    cfg = workdir["cfg"]
    traj_path, mf_path, scene_path, id2name = write_multifuture_dataset(
        workdir["root"], cfg, rng, num_traj=4, max_pred_len=8)

    out_file = os.path.join(workdir["root"], "mf.traj.p")
    prob_file = os.path.join(workdir["root"], "mf.prob.p")
    model_path = os.path.join(trained, "toy", "01", "best")
    multifuture_inference.main([
        model_path, traj_path, mf_path, out_file,
        "--save_prob_file", prob_file,
        "--obs_length", "4",
        "--num_out", "4", "--diverse_beam", "--diverse_gamma", "0.01",
        "--fix_num_timestep", "1",
        "--grid_strides", "2,4", "--use_grids", "1,0",
        "--emb_size", "8", "--enc_hidden_size", "16",
        "--dec_hidden_size", "16", "--scene_conv_dim", "8",
        "--use_gnn", "--use_scene_enc",
        "--scene_feat_path", scene_path,
        "--scene_id2name", id2name,
        "--scene_h", "12", "--scene_w", "16", "--scene_class", "5",
        "--batch_size", "2", "--compute_dtype", "float32",
    ])
    assert os.path.exists(out_file) and os.path.exists(prob_file)

    multifuture_eval_trajs.main([mf_path, out_file])
    lines = capsys.readouterr().out.strip().splitlines()
    vals = [float(x) for x in lines[-1].split()]
    assert len(vals) == 6 and all(np.isfinite(vals))

    multifuture_eval_trajs_prob.main([
        mf_path, prob_file, "--scene_h", "6", "--scene_w", "8"])
    lines = capsys.readouterr().out.strip().splitlines()
    vals = [float(x) for x in lines[-1].split()]
    assert len(vals) == 5 and all(np.isfinite(vals))


def test_multifuture_inference_norm_input_flag(trained, workdir,
                                               capsys):
    """--norm_input on the offline driver reaches the model: a
    norm_input-trained checkpoint must be decodable with the same
    scaling it trained with (reference: SimAug/code/pred_models.py
    :284-286 normalizes train and test alike)."""
    from multiverse_tpu.cli import multifuture_inference

    rng = workdir["rng"]
    cfg = workdir["cfg"]
    root = os.path.join(workdir["root"], "norm")
    os.makedirs(root, exist_ok=True)
    traj_path, mf_path, scene_path, id2name = write_multifuture_dataset(
        root, cfg, rng, num_traj=2, max_pred_len=6)

    model_path = os.path.join(trained, "toy", "01", "best")
    base_args = [
        model_path, traj_path, mf_path, "",
        "--obs_length", "4",
        "--num_out", "4", "--diverse_beam", "--diverse_gamma", "0.01",
        "--fix_num_timestep", "1",
        "--grid_strides", "2,4", "--use_grids", "1,0",
        "--emb_size", "8", "--enc_hidden_size", "16",
        "--dec_hidden_size", "16", "--scene_conv_dim", "8",
        "--use_gnn", "--use_scene_enc",
        "--scene_feat_path", scene_path,
        "--scene_id2name", id2name,
        "--scene_h", "12", "--scene_w", "16", "--scene_class", "5",
        "--batch_size", "2", "--compute_dtype", "float32",
    ]
    outs = {}
    for tag, extra in (("plain", []), ("norm", ["--norm_input"])):
        out_file = os.path.join(root, "mf_%s.traj.p" % tag)
        args = list(base_args)
        args[3] = out_file
        multifuture_inference.main(args + extra)
        with open(out_file, "rb") as f:
            outs[tag] = pickle.load(f)
    capsys.readouterr()
    # the scaling must actually change the decode (inputs are one-hot
    # maps, so [-1,1] rescaling shifts every scene feature)
    a = np.concatenate([np.asarray(v).ravel()
                        for v in outs["plain"].values()])
    b = np.concatenate([np.asarray(v).ravel()
                        for v in outs["norm"].values()])
    assert a.shape == b.shape
    assert not np.allclose(a, b)


def test_multifuture_inference_decode_quant(trained, workdir, capsys,
                                            monkeypatch):
    """--decode_quant int8a drives the q8 fused decode through the full
    offline CLI (the serving-default tier on the offline driver),
    exercised on CPU via interpret-mode kernels; output contracts must
    hold as on the parity path."""
    from multiverse_tpu.cli import multifuture_inference
    from multiverse_tpu.ops import pallas_decode

    monkeypatch.setattr(pallas_decode, "FORCE_INTERPRET_FUSED", True)
    rng = workdir["rng"]
    cfg = workdir["cfg"]
    # own subdir: the module-scoped workdir root already holds the
    # pipeline test's 4-trajectory dataset (globbed by the loader)
    root = os.path.join(workdir["root"], "q8")
    os.makedirs(root, exist_ok=True)
    traj_path, mf_path, scene_path, id2name = write_multifuture_dataset(
        root, cfg, rng, num_traj=3, max_pred_len=6)

    out_file = os.path.join(root, "mf_q8.traj.p")
    model_path = os.path.join(trained, "toy", "01", "best")
    multifuture_inference.main([
        model_path, traj_path, mf_path, out_file,
        "--obs_length", "4",
        "--num_out", "4", "--diverse_beam", "--diverse_gamma", "0.01",
        "--fix_num_timestep", "1",
        "--grid_strides", "2,4", "--use_grids", "1,0",
        "--emb_size", "8", "--enc_hidden_size", "16",
        "--dec_hidden_size", "16", "--scene_conv_dim", "8",
        "--use_gnn", "--use_scene_enc",
        "--scene_feat_path", scene_path,
        "--scene_id2name", id2name,
        "--scene_h", "12", "--scene_w", "16", "--scene_class", "5",
        "--batch_size", "2",
        "--compute_dtype", "bfloat16", "--decode_quant", "int8a",
    ])
    capsys.readouterr()
    with open(out_file, "rb") as f:
        data = pickle.load(f)
    assert len(data) == 3
    for trajs in data.values():
        arr = np.asarray(trajs)
        assert arr.shape[0] == 4 and arr.shape[-1] == 2
        assert np.isfinite(arr).all()
