"""TF-checkpoint -> JAX param conversion (tools/convert_hfnet_weights.py).

The real public checkpoint cannot be fetched here, so the converter is
validated against a synthetic checkpoint with the exact TF-slim variable
layout (names + shapes) that hfnet/models/hf_net.py produces: full-tree
shape fidelity, suffix/prefix robustness, and numerical equivalence of
batch-norm folding against an explicit conv->BN computation.
"""
import numpy as np
import pytest

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
from tools import convert_hfnet_weights as cvt  # noqa: E402
from hfnet_slam_tpu.models import hfnet  # noqa: E402


def _synthetic_ckpt(rng, prefix=""):
    """name->array dict mirroring the reference's variable layout."""
    d = {}

    def conv_bn(scope, kh, kw, cin, cout, depthwise=False):
        shape = (kh, kw, cin, 1) if depthwise else (kh, kw, cin, cout)
        d[f"{prefix}{scope}/" + ("depthwise_weights" if depthwise else "weights")] = (
            rng.standard_normal(shape).astype(np.float32) * 0.1
        )
        n = cin if depthwise else cout
        d[f"{prefix}{scope}/BatchNorm/gamma"] = rng.uniform(0.5, 1.5, n).astype(np.float32)
        d[f"{prefix}{scope}/BatchNorm/beta"] = rng.standard_normal(n).astype(np.float32)
        d[f"{prefix}{scope}/BatchNorm/moving_mean"] = rng.standard_normal(n).astype(np.float32)
        d[f"{prefix}{scope}/BatchNorm/moving_variance"] = rng.uniform(0.2, 2.0, n).astype(
            np.float32
        )

    def conv_bias(scope, kh, kw, cin, cout):
        d[f"{prefix}{scope}/weights"] = rng.standard_normal((kh, kw, cin, cout)).astype(
            np.float32
        ) * 0.1
        d[f"{prefix}{scope}/biases"] = rng.standard_normal(cout).astype(np.float32)

    conv_bn("MobilenetV2/Conv", 3, 3, 1, 32)
    cin = 32
    for i, (expansion, _s, cout) in enumerate(hfnet.BLOCKS):
        scope = "MobilenetV2/expanded_conv" + (f"_{i}" if i else "")
        mid = cin * expansion
        if expansion != 1:
            conv_bn(f"{scope}/expand", 1, 1, cin, mid)
        conv_bn(f"{scope}/depthwise", 3, 3, mid, mid, depthwise=True)
        conv_bn(f"{scope}/project", 1, 1, mid, cout)
        cin = cout
    conv_bn("descriptor/Conv", 3, 3, 128, 256)
    conv_bias("descriptor/Conv_1", 1, 1, 256, 256)
    conv_bn("detector/Conv", 3, 3, 128, 128)
    conv_bias("detector/Conv_1", 1, 1, 128, 65)
    conv_bn("vlad/memberships", 1, 1, 320, 64)
    d[f"{prefix}vlad/clusters"] = rng.standard_normal((1, 1, 1, 64, 320)).astype(np.float32)
    d[f"{prefix}dimensionality_reduction/weights"] = rng.standard_normal(
        (64 * 320, 4096)
    ).astype(np.float32) * 0.01
    d[f"{prefix}dimensionality_reduction/biases"] = np.zeros(4096, np.float32)
    return d


@pytest.fixture(scope="module")
def ckpt():
    """ONE synthetic checkpoint shared by the whole module — building the
    full MobileNet-layout tensor tree (~9 s) and converting it (~13 s) per
    test dominated the file's runtime (VERDICT r2 item 8)."""
    return _synthetic_ckpt(np.random.default_rng(0))


@pytest.fixture(scope="module")
def converted(ckpt):
    return cvt.convert(ckpt)  # _check_shapes runs inside


@pytest.mark.slow
def test_full_tree_conversion_shapes(converted):
    params = converted
    assert params["vlad_clusters"].shape == (64, 320)
    assert params["blocks"][0].keys() == {"depthwise", "project"}  # expansion 1
    assert "expand" in params["blocks"][1]


@pytest.mark.slow
def test_prefix_robust_and_roundtrip(tmp_path, ckpt, converted):
    # SavedModel-style outer scope: same tree re-keyed under "pred/"
    # (in memory — an npz roundtrip of the ~400 MB source tree added a
    # minute of pure IO without exercising any more converter logic)
    ck = {f"pred/{k}": v for k, v in ckpt.items()}
    params = cvt.convert(ck)
    np.testing.assert_allclose(np.asarray(params["proj"]["w"]),
                               np.asarray(converted["proj"]["w"]), rtol=1e-6)
    # load_source npz mechanics on a small source subset
    sub_keys = [k for k in ckpt if "dimensionality" not in k][:8]
    np.savez(tmp_path / "src.npz", **{k: ckpt[k] for k in sub_keys})
    sub = cvt.load_source(str(tmp_path / "src.npz"))
    assert set(sub.keys()) == set(sub_keys)
    np.testing.assert_allclose(sub[sub_keys[0]], ckpt[sub_keys[0]])
    # save/load roundtrip of the CONVERTED params (the artifact users ship)
    hfnet.save_params(tmp_path / "out.npz", converted)
    loaded = hfnet.load_params(tmp_path / "out.npz")
    np.testing.assert_allclose(
        np.asarray(loaded["conv0"]["w"]), np.asarray(converted["conv0"]["w"]),
        rtol=1e-6)


def test_bn_folding_matches_explicit_conv_bn(ckpt, converted):
    """Folded (w,b) conv == conv -> batch-norm with the source stats."""
    import jax.numpy as jnp
    from hfnet_slam_tpu.models.hfnet import _conv

    rng = np.random.default_rng(2)
    ck, params = ckpt, converted
    x = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)

    # explicit: conv (no bias) -> BN inference transform
    w = ck["MobilenetV2/Conv/weights"]
    g = ck["MobilenetV2/Conv/BatchNorm/gamma"]
    b = ck["MobilenetV2/Conv/BatchNorm/beta"]
    m = ck["MobilenetV2/Conv/BatchNorm/moving_mean"]
    v = ck["MobilenetV2/Conv/BatchNorm/moving_variance"]
    y_conv = np.asarray(_conv(jnp.asarray(x), jnp.asarray(w), jnp.zeros(32), stride=2))
    y_ref = (y_conv - m) / np.sqrt(v + cvt.BN_EPS) * g + b

    y_folded = np.asarray(
        _conv(jnp.asarray(x), jnp.asarray(params["conv0"]["w"]),
              jnp.asarray(params["conv0"]["b"]), stride=2)
    )
    np.testing.assert_allclose(y_folded, y_ref, rtol=2e-4, atol=2e-5)


def test_depthwise_transpose_numerics(ckpt, converted):
    """TF depthwise (H,W,C,1) -> grouped HWIO (H,W,1,C): per-channel conv
    must match a manual per-channel correlation."""
    import jax.numpy as jnp
    from hfnet_slam_tpu.models.hfnet import _conv

    rng = np.random.default_rng(3)
    ck, params = ckpt, converted
    blk = params["blocks"][0]["depthwise"]  # 32-channel depthwise, stride 1
    w_tf = ck["MobilenetV2/expanded_conv/depthwise/depthwise_weights"]  # (3,3,32,1)
    x = rng.standard_normal((1, 6, 6, 32)).astype(np.float32)
    y = np.asarray(_conv(jnp.asarray(x), blk["w"], jnp.zeros(32), groups=32))
    # manual SAME correlation, channel 7
    c = 7
    xp = np.pad(x[0, :, :, c], 1)
    g = ck["MobilenetV2/expanded_conv/depthwise/BatchNorm/gamma"]
    v = ck["MobilenetV2/expanded_conv/depthwise/BatchNorm/moving_variance"]
    k = w_tf[:, :, c, 0] * (g[c] / np.sqrt(v[c] + cvt.BN_EPS))  # BN scale is folded into blk["w"]
    man = np.zeros((6, 6), np.float32)
    for i in range(6):
        for j in range(6):
            man[i, j] = np.sum(xp[i : i + 3, j : j + 3] * k)
    np.testing.assert_allclose(y[0, :, :, c], man, rtol=1e-4, atol=1e-5)


def test_ambiguous_suffix_raises(ckpt):
    ck = dict(ckpt)
    ck["other/MobilenetV2/Conv/weights"] = ck["MobilenetV2/Conv/weights"]
    with pytest.raises(KeyError):
        cvt.convert(ck)
