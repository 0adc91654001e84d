"""TF checkpoint name mapping (pure part; reading needs tensorflow)."""

import jax
import numpy as np
import pytest

from multiverse_tpu.config import MultiverseConfig
from multiverse_tpu.models import init_params
from multiverse_tpu.tools.tf_converter import (
    _set_path,
    map_reference_variables,
    map_variable,
)


CFG = MultiverseConfig(
    scene_grid_strides=(2, 4), use_grids=(True, False)).validate()

# the released checkpoints' REAL variable names: the reference builds
# cells named enc_grid_{i}/dec_grid_{i} inside dynamic_rnn(scope=
# "encoder_grid_class_{i}") / raw_rnn(scope="decoder_rnn") under
# variable_scope("decoder_grid_class_{i}"), creates the decoder
# grid_emb INSIDE the raw_rnn loop_fn (hence under decoder_rnn/), and
# rebases hidden2grid_* to top scope (reference: code/pred_models.py:
# 140-306, 311-471, 925-959; scope mechanics verified against TF)
REFERENCE_NAMES = [
    "person_pred/scene_conv1/W",
    "person_pred/scene_conv1/b",
    "person_pred/scene_conv2/W",
    "person_pred/scene_conv2/b",
    "person_pred/encoder_grid_class_0/enc_grid_0/kernel",
    "person_pred/encoder_grid_class_0/enc_grid_0/biases",
    "person_pred/encoder_grid_reg_0/enc_grid_regress_0/kernel",
    "person_pred/encoder_grid_reg_0/enc_grid_regress_0/biases",
    "person_pred/decoder_grid_class_0/decoder_rnn/dec_grid_0/kernel",
    "person_pred/decoder_grid_class_0/decoder_rnn/dec_grid_0/biases",
    "person_pred/decoder_grid_reg_0/decoder_rnn/dec_grid_reg_0/kernel",
    "person_pred/decoder_grid_reg_0/decoder_rnn/dec_grid_reg_0/biases",
    "person_pred/decoder_grid_class_0/decoder_rnn/grid_emb/W",
    "person_pred/decoder_grid_class_0/decoder_rnn/grid_emb/b",
    "person_pred/decoder_grid_reg_0/decoder_rnn/grid_emb/W",
    "person_pred/decoder_grid_reg_0/decoder_rnn/grid_emb/b",
    "person_pred/hidden2grid_decoder_grid_class_0/out_dec_grid/W",
    "person_pred/hidden2grid_decoder_grid_reg_0/out_dec_grid/W",
    "global_step",
    "person_pred/scene_conv1/W/Adadelta",
    "person_pred/scene_conv1/W/Adadelta_1",
]


def test_map_covers_all_model_variables():
    mapping = map_reference_variables(REFERENCE_NAMES, CFG)
    # optimizer slots + global step excluded
    assert "global_step" not in mapping
    assert not any("Adadelta" in k for k in mapping)
    assert len(mapping) == 18

    params = init_params(jax.random.PRNGKey(0), CFG)
    # every mapped path exists in the real param tree
    for name, path in mapping.items():
        node = params
        for key in path:
            assert key in node, (name, path)
            node = node[key]

    # every param leaf is covered (default config has no single-decoder
    # or enc_grid_emb leaves)
    covered = set(mapping.values())
    for kp, _ in jax.tree_util.tree_flatten_with_path(params)[0]:
        path = tuple(str(getattr(k, "key", k)) for k in kp)
        assert path in covered, path


def test_map_disambiguates_cells():
    assert map_variable(
        "a/enc_grid_regress_0/kernel", CFG) == (
        "scales", "0", "enc_reg", "kernel")
    assert map_variable("a/enc_grid_0/kernel", CFG) == (
        "scales", "0", "enc_class", "kernel")
    assert map_variable("a/dec_grid_reg_0/biases", CFG) == (
        "scales", "0", "dec_reg", "bias")
    assert map_variable("person_pred/grid_emb/W", CFG) == (
        "scales", "0", "enc_grid_emb", "w")
    assert map_variable(
        "person_pred/decoder_grid_class_0/grid_emb/W", CFG) == (
        "scales", "0", "dec_class_emb", "w")
    # the real graph nests the decoder grid_emb under raw_rnn's scope
    assert map_variable(
        "person_pred/decoder_grid_class_0/decoder_rnn/grid_emb/W",
        CFG) == ("scales", "0", "dec_class_emb", "w")
    assert map_variable(
        "person_pred/decoder_grid_reg_0/decoder_rnn/grid_emb/b",
        CFG) == ("scales", "0", "dec_reg_emb", "b")
    assert map_variable("whatever/unrelated/W", CFG) is None


def test_set_path_shape_check():
    params = init_params(jax.random.PRNGKey(0), CFG)
    good = np.zeros_like(np.asarray(params["scene_conv1"]["b"]))
    _set_path(params, ("scene_conv1", "b"), good)
    with pytest.raises(ValueError):
        _set_path(params, ("scene_conv1", "b"),
                  np.zeros((3,), np.float32))
    with pytest.raises(KeyError):
        _set_path(params, ("scene_conv1", "nope"), good)


def test_duplicate_mapping_rejected():
    with pytest.raises(ValueError):
        map_reference_variables(
            ["a/scene_conv1/W", "b/scene_conv1/W"], CFG)
