"""Direct parity against the reference implementation, executed
verbatim from /root/reference (skipped when unavailable)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from tests.synthetic import tiny_config, write_reference_format_dataset

    root = tmp_path_factory.mktemp("parity")
    cfg = tiny_config()
    rng = np.random.RandomState(11)
    traj_path, scene_path, id2name = write_reference_format_dataset(
        str(root), cfg, rng, num_videos=2, frames_per_video=20)
    return dict(root=str(root), cfg=cfg, traj_path=traj_path,
                scene_path=scene_path, id2name=id2name)


def test_preprocess_npz_bit_parity(dataset):
    """The reference preprocess.py and ours must produce identical npz
    files on the same input (schema + values)."""
    pytest.importorskip("tensorflow")  # reference imports tf via pred_utils
    from multiverse_tpu.cli import preprocess

    flags = [
        "--obs_len", "4", "--pred_len", "5",
        "--add_grid", "--add_all_reg", "--add_scene",
        "--scene_feat_path", dataset["scene_path"],
        "--scene_id2name", dataset["id2name"],
        "--direct_scene_feat",
        "--scene_h", "12", "--scene_w", "16",
        "--grid_strides", "2,4",
    ]
    ours_out = os.path.join(dataset["root"], "ours")
    preprocess.main([dataset["traj_path"], ours_out, *flags])

    ref_out = os.path.join(dataset["root"], "ref")
    r = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "code", "preprocess.py"),
         dataset["traj_path"], ref_out, *flags],
        capture_output=True, text=True, timeout=480)
    assert r.returncode == 0, r.stderr[-2000:]

    for split in ("train", "val", "test"):
        ref = dict(np.load(os.path.join(ref_out, "data_%s.npz" % split),
                           allow_pickle=True))
        ours = dict(np.load(os.path.join(ours_out, "data_%s.npz" % split),
                            allow_pickle=True))
        assert set(ref) == set(ours), split

        # the reference iterates videos in unsorted glob order, so
        # example order is filesystem-dependent — compare under a
        # canonical per-example sort (videoname, start frame, obs xy)
        def order(d):
            vid2name = d["vid2name"].item()
            keys = []
            for i in range(len(d["obs_traj"])):
                keys.append((
                    str(vid2name[int(d["obs_vid"][i])]),
                    float(d["obs_frameidx"][i][0]),
                    tuple(np.asarray(d["obs_traj"][i]).reshape(-1)),
                ))
            return np.argsort(
                np.array([str(k) for k in keys]), kind="stable")

        ri, oi = order(ref), order(ours)
        assert len(ri) == len(oi), split
        per_example = [
            "obs_traj", "pred_traj", "obs_traj_rel", "pred_traj_rel",
            "obs_grid_class", "pred_grid_class", "obs_frameidx",
            "obs_grid_target_all_0", "pred_grid_target_all_0",
            "obs_grid_target_all_1", "pred_grid_target_all_1",
        ]
        for key in per_example:
            np.testing.assert_array_equal(
                ref[key][ri], ours[key][oi],
                err_msg="%s/%s" % (split, key))
        # scene features: compare dereferenced per (example, timestep)
        ref_scene = ref["scene_feat"][ref["obs_scene"][ri][..., 0]]
        our_scene = ours["scene_feat"][ours["obs_scene"][oi][..., 0]]
        np.testing.assert_array_equal(
            ref_scene, our_scene, err_msg="%s/scene" % split)
        for key in ("grid_center_0", "grid_center_1", "video_wh",
                    "scene_grid_strides"):
            np.testing.assert_array_equal(
                ref[key], ours[key], err_msg="%s/%s" % (split, key))


def test_evaluators_verbatim_on_our_outputs(dataset, tmp_path):
    """The reference's evaluators run unmodified on our inference
    pickles and print the same numbers our evaluators compute."""
    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.eval.multifuture import (
        evaluate_multifuture_nll,
        evaluate_multifuture_trajs,
    )
    from multiverse_tpu.eval.sdd import evaluate_sdd
    from multiverse_tpu.inference import (
        run_multifuture_inference,
        save_outputs,
        synthesize_multifuture_inputs,
    )
    from multiverse_tpu.models import init_params
    from tests.synthetic import write_multifuture_dataset

    cfg = MultiverseConfig(
        obs_len=4, pred_len=5,
        scene_h=12, scene_w=16, video_h=540, video_w=960,
        enc_hidden_size=16, dec_hidden_size=16,
        scene_conv_dim=8, emb_size=8,
        scene_grid_strides=(2, 4), use_grids=(True, False),
        use_beam_search=True, beam_size=4,
        diverse_beam=True, diverse_gamma=0.01).validate()
    rng = np.random.RandomState(9)
    _, mf_path, _, _ = write_multifuture_dataset(
        str(tmp_path), cfg, rng, num_traj=4, max_pred_len=8)

    params = init_params(jax.random.PRNGKey(2), cfg)
    inputs = synthesize_multifuture_inputs(cfg, num_traj=4,
                                           max_pred_len=8)
    # give our synthetic inputs the GT-matched ids/lengths
    import pickle as pkl

    gt_ids = sorted(
        os.path.splitext(f)[0] for f in os.listdir(mf_path))
    lengths = []
    for tid in gt_ids:
        with open(os.path.join(mf_path, "%s.p" % tid), "rb") as f:
            gt = pkl.load(f)
        lengths.append(max(len(gt[k]["x_agent_traj"]) for k in gt))
    inputs = inputs._replace(
        traj_ids=gt_ids,
        pred_lengths=np.asarray(lengths, np.int32))

    out, prob = run_multifuture_inference(params, inputs, cfg,
                                          batch_size=4)
    traj_p = str(tmp_path / "o.traj.p")
    prob_p = str(tmp_path / "o.prob.p")
    save_outputs(out, prob, traj_p, prob_p)

    ours_ade = evaluate_multifuture_trajs(out, mf_path)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REFERENCE, "code", "multifuture_eval_trajs.py"),
         mf_path, traj_p],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-1500:]
    nums = [float(v) for v in r.stdout.strip().splitlines()[-1].split()]
    np.testing.assert_allclose(nums, [
        ours_ade["minade_45-degree"], ours_ade["minade_top-down"],
        ours_ade["minade_all"], ours_ade["minfde_45-degree"],
        ours_ade["minfde_top-down"], ours_ade["minfde_all"]],
        rtol=1e-9)

    ours_nll = evaluate_multifuture_nll(
        prob, mf_path, scene_h=6, scene_w=8,
        video_h=540, video_w=960)
    r = subprocess.run(
        [sys.executable,
         os.path.join(REFERENCE, "code",
                      "multifuture_eval_trajs_prob.py"),
         mf_path, prob_p, "--scene_h", "6", "--scene_w", "8",
         "--video_h", "540", "--video_w", "960"],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-1500:]
    nums = [float(v) for v in r.stdout.strip().splitlines()[-1].split()]
    expect = [ours_nll["nll_T=%d" % t] for t in (1, 2, 3, 4, 5)]
    np.testing.assert_allclose(nums, expect, rtol=1e-9)

    # SDD rescaled eval: reference script on a synthetic output pickle
    import pickle

    gt = rng.rand(3, 4, 2) * 100
    data = {
        "pred_gt_list": list(gt),
        "grid0_pred_traj": list(gt + 2.0),
        "seq_ids": np.asarray(
            ["videoA_0_10_1", "videoB_1_20_2", "videoB_1_30_3"]),
    }
    outp = str(tmp_path / "sdd.p")
    with open(outp, "wb") as f:
        pickle.dump(data, f)
    changelst = tmp_path / "change.lst"
    changelst.write_text(
        "videoA_0,1000x2000,True\nvideoB_1,1920x1080,False\n")
    ours_sdd = evaluate_sdd(outp, str(changelst))
    r = subprocess.run(
        [sys.executable,
         os.path.join(REFERENCE, "SimAug", "code", "evaluate_sdd.py"),
         str(changelst), outp],
        capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-1500:]
    line = r.stdout.strip().splitlines()[-1]
    ade_fde = line.split("ade/fde ")[1].split(",")[:2]
    np.testing.assert_allclose(
        [float(ade_fde[0]), float(ade_fde[1])],
        [ours_sdd["ade"], ours_sdd["fde"]], rtol=1e-9)


def test_preprocess_full_feature_parity(dataset):
    """All optional features on (kp, person/other boxes, activities):
    the reference preprocess and ours agree bit-for-bit on one video
    (single video → deterministic order, so raw equality applies)."""
    pytest.importorskip("tensorflow")
    import pickle

    from multiverse_tpu.cli import preprocess
    from tests.synthetic import tiny_config, write_reference_format_dataset

    root = os.path.join(dataset["root"], "full")
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(3)
    cfg = tiny_config()
    traj_path, scene_path, id2name = write_reference_format_dataset(
        root, cfg, rng, num_videos=1, frames_per_video=12)
    paths = {p: os.path.join(root, p) for p in ("kp", "pb", "ob", "act")}
    for split in ("train", "val", "test"):
        for sub in paths.values():
            os.makedirs(os.path.join(sub, split), exist_ok=True)
        for fn in os.listdir(os.path.join(traj_path, split)):
            videoname = os.path.splitext(fn)[0]
            rows = np.loadtxt(
                os.path.join(traj_path, split, fn), delimiter="\t")
            kp, pb, ob, act = {}, {}, {}, {}
            for fid, pid, x, y in rows:
                key = "%d_%d" % (fid, pid)
                kp[key] = rng.randn(17, 3).astype(np.float32)
                pb[key] = np.array([x - 5, y - 20, x + 5, y], np.float32)
                ob[key] = ([[0.0, 0.0, 9.0, 9.0]], [1])
                # the reference's data contract: BG (0) never mixes
                # with real activity ids
                act[key] = ([1], [500], [21], [10])
            for sub, d in zip(paths.values(), (kp, pb, ob, act)):
                with open(os.path.join(
                        sub, split, "%s.p" % videoname), "wb") as f:
                    pickle.dump(d, f)

    flags = [
        "--obs_len", "4", "--pred_len", "5",
        "--add_grid", "--add_all_reg", "--add_scene",
        "--add_kp", "--kp_path", paths["kp"],
        "--add_person_box", "--person_box_path", paths["pb"],
        "--add_other_box", "--other_box_path", paths["ob"],
        "--add_activity", "--activity_path", paths["act"],
        "--scene_feat_path", scene_path, "--scene_id2name", id2name,
        "--direct_scene_feat", "--scene_h", "12", "--scene_w", "16",
        "--grid_strides", "2,4",
    ]
    preprocess.main([traj_path, os.path.join(root, "ours"), *flags])
    r = subprocess.run(
        [sys.executable, os.path.join(REFERENCE, "code", "preprocess.py"),
         traj_path, os.path.join(root, "ref"), *flags],
        capture_output=True, text=True, timeout=480)
    assert r.returncode == 0, r.stderr[-2000:]

    ref = dict(np.load(os.path.join(root, "ref", "data_train.npz"),
                       allow_pickle=True))
    ours = dict(np.load(os.path.join(root, "ours", "data_train.npz"),
                        allow_pickle=True))
    assert set(ref) == set(ours)
    for key in ref:
        a, b = ref[key], ours[key]
        if a.dtype == object:
            assert np.array_equal(
                np.asarray(a, object).tolist(),
                np.asarray(b, object).tolist()), key
        else:
            assert a.shape == b.shape, key
            if a.size:
                np.testing.assert_array_equal(a, b, err_msg=key)


def test_tf_checkpoint_conversion_roundtrip(tmp_path):
    """Write a TF1-style checkpoint with the reference's variable names
    and shapes, convert it, and verify every value lands on the right
    parameter leaf."""
    tf = pytest.importorskip("tensorflow")
    import jax

    from multiverse_tpu.config import MultiverseConfig
    from multiverse_tpu.models import init_params
    from multiverse_tpu.tools.tf_converter import (
        convert_tf_checkpoint,
        map_reference_variables,
    )

    cfg = MultiverseConfig(
        scene_h=12, scene_w=16, scene_class=5,
        emb_size=8, enc_hidden_size=16, dec_hidden_size=16,
        scene_conv_dim=8,
        scene_grid_strides=(2, 4), use_grids=(True, False)).validate()
    params = init_params(jax.random.PRNGKey(0), cfg)

    # reference-named variables shaped like our param tree
    name_of = {
        ("scene_conv1", "w"): "person_pred/scene_conv1/W",
        ("scene_conv1", "b"): "person_pred/scene_conv1/b",
        ("scene_conv2", "w"): "person_pred/scene_conv2/W",
        ("scene_conv2", "b"): "person_pred/scene_conv2/b",
        ("scales", "0", "enc_class", "kernel"):
            "person_pred/encoder_grid_class_0/enc_grid_0/kernel",
        ("scales", "0", "enc_class", "bias"):
            "person_pred/encoder_grid_class_0/enc_grid_0/biases",
        ("scales", "0", "enc_reg", "kernel"):
            "person_pred/encoder_grid_reg_0/enc_grid_regress_0/kernel",
        ("scales", "0", "enc_reg", "bias"):
            "person_pred/encoder_grid_reg_0/enc_grid_regress_0/biases",
        ("scales", "0", "dec_class", "kernel"):
            "person_pred/decoder_grid_class_0/decoder_rnn/dec_grid_0/kernel",
        ("scales", "0", "dec_class", "bias"):
            "person_pred/decoder_grid_class_0/decoder_rnn/dec_grid_0/biases",
        ("scales", "0", "dec_reg", "kernel"):
            "person_pred/decoder_grid_reg_0/decoder_rnn/dec_grid_reg_0/kernel",
        ("scales", "0", "dec_reg", "bias"):
            "person_pred/decoder_grid_reg_0/decoder_rnn/dec_grid_reg_0/biases",
        ("scales", "0", "dec_class_emb", "w"):
            "person_pred/decoder_grid_class_0/decoder_rnn/grid_emb/W",
        ("scales", "0", "dec_class_emb", "b"):
            "person_pred/decoder_grid_class_0/decoder_rnn/grid_emb/b",
        ("scales", "0", "dec_reg_emb", "w"):
            "person_pred/decoder_grid_reg_0/decoder_rnn/grid_emb/W",
        ("scales", "0", "dec_reg_emb", "b"):
            "person_pred/decoder_grid_reg_0/decoder_rnn/grid_emb/b",
        ("scales", "0", "h2g_class", "w"):
            "person_pred/hidden2grid_decoder_grid_class_0/out_dec_grid/W",
        ("scales", "0", "h2g_reg", "w"):
            "person_pred/hidden2grid_decoder_grid_reg_0/out_dec_grid/W",
    }

    rng = np.random.RandomState(0)
    expected = {}
    graph = tf.Graph()
    with graph.as_default():
        for path, tf_name in name_of.items():
            node = params
            for k in path:
                node = node[k]
            val = rng.randn(*node.shape).astype(np.float32)
            expected[path] = val
            tf.compat.v1.get_variable(
                tf_name, initializer=tf.constant(val))
        saver = tf.compat.v1.train.Saver()
        with tf.compat.v1.Session(graph=graph) as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            ckpt_dir = str(tmp_path / "ckpt")
            os.makedirs(ckpt_dir)
            saver.save(sess, os.path.join(ckpt_dir, "model"),
                       global_step=7)

    # sanity: the mapping covers what we wrote
    mapping = map_reference_variables(
        [v for v in name_of.values()], cfg)
    assert len(mapping) == len(name_of)

    converted = convert_tf_checkpoint(
        os.path.join(ckpt_dir, "model-7"), cfg, params, strict=True)
    for path, val in expected.items():
        node = converted
        for k in path:
            node = node[k]
        np.testing.assert_array_equal(np.asarray(node), val)

    # the CLI end of the same path: convert into the orbax run layout
    # and restore it the way mvt-test --load does
    from multiverse_tpu.cli.convert_tf import main as convert_tf_main
    from multiverse_tpu.train.checkpoints import CheckpointManager

    out_base = str(tmp_path / "runs")
    convert_tf_main([
        os.path.join(ckpt_dir, "model-7"), out_base, "converted", "1",
        "--scene_h", "12", "--scene_w", "16", "--scene_class", "5",
        "--emb_size", "8", "--enc_hidden_size", "16",
        "--dec_hidden_size", "16", "--scene_conv_dim", "8",
        "--scene_grid_strides", "2,4", "--use_grids", "1,0",
        "--use_scene_enc",
    ])
    run_dir = os.path.join(out_base, "converted", "01")
    restored = CheckpointManager(run_dir).restore_params(
        params, best=True)
    leaf = ("scales", "0", "dec_class_emb", "w")
    node = restored
    for k in leaf:
        node = node[k]
    np.testing.assert_array_equal(np.asarray(node), expected[leaf])
