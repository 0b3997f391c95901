import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hfnet_slam_tpu.models import hfnet
from hfnet_slam_tpu.models.extractor import HFExtractor
from hfnet_slam_tpu.ops import extract as X


@pytest.fixture(scope="module")
def params():
    return hfnet.init_params(jax.random.PRNGKey(0))


class TestForward:
    def test_shapes(self, params):
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 96, 128, 1)) * 255.0
        out = hfnet.forward(params, img)
        assert out["scores_dense"].shape == (1, 96, 128)
        assert out["desc_map"].shape == (1, 12, 16, 256)
        assert out["global_desc"].shape == (1, 4096)

    def test_normalizations(self, params):
        img = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 1)) * 255.0
        out = hfnet.forward(params, img)
        np.testing.assert_allclose(
            jnp.linalg.norm(out["desc_map"], axis=-1), 1.0, atol=1e-4
        )
        np.testing.assert_allclose(
            jnp.linalg.norm(out["global_desc"], axis=-1), 1.0, atol=1e-4
        )
        s = out["scores_dense"]
        assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0

    def test_scores_are_probabilities(self, params):
        # sum over each 8x8 cell of (softmax minus dustbin) must be < 1
        img = jnp.full((1, 32, 32, 1), 100.0)
        out = hfnet.forward(params, img)
        s = out["scores_dense"][0]
        cell = s.reshape(4, 8, 4, 8).sum(axis=(1, 3))
        assert float(cell.max()) < 1.0 + 1e-5


class TestNMS:
    def test_isolated_peak_survives(self):
        s = jnp.zeros((1, 32, 32)).at[0, 10, 10].set(0.9)
        out = X.simple_nms(s, radius=4)
        assert float(out[0, 10, 10]) == pytest.approx(0.9)

    def test_suppresses_neighbors(self):
        s = jnp.zeros((1, 32, 32)).at[0, 10, 10].set(0.9).at[0, 12, 12].set(0.5)
        out = X.simple_nms(s, radius=4)
        assert float(out[0, 10, 10]) == pytest.approx(0.9)
        assert float(out[0, 12, 12]) == 0.0

    def test_far_peaks_both_survive(self):
        s = jnp.zeros((1, 64, 64)).at[0, 10, 10].set(0.9).at[0, 40, 40].set(0.5)
        out = X.simple_nms(s, radius=4)
        assert float(out[0, 40, 40]) == pytest.approx(0.5)


class TestSampleDescriptors:
    def test_exact_grid_points(self):
        h, w, C = 6, 8, 4
        dm = jax.random.normal(jax.random.PRNGKey(3), (h, w, C))
        H, W = 48, 64
        # keypoint at image position mapping exactly to map cell (2,3):
        # x_map = (w-1)/(W-1)*x -> x = 3*(W-1)/(w-1)
        x = 3 * (W - 1) / (w - 1)
        y = 2 * (H - 1) / (h - 1)
        out = X.sample_descriptors(dm, jnp.array([[x, y]]), (H, W))
        expected = dm[2, 3] / jnp.linalg.norm(dm[2, 3])
        np.testing.assert_allclose(out[0], expected, atol=1e-5)

    def test_midpoint_interpolation(self):
        dm = jnp.zeros((2, 2, 1)).at[0, 0, 0].set(1.0).at[0, 1, 0].set(3.0)
        # x halfway between cells 0 and 1 of a 2-wide map with W=17: x_map = x/16
        out = X.sample_descriptors(dm, jnp.array([[8.0, 0.0]]), (17, 17))
        # raw value 2.0, then L2 normalized -> 1.0
        np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-5)


def test_level_budgets():
    b = X.level_budgets(1000, 1.2, 4)
    assert sum(b) == 1000
    assert b[0] > b[1] > b[2]
    assert all(x > 0 for x in b)


class TestExtractor:
    @pytest.fixture(scope="class")
    def feats(self, params):
        ext = HFExtractor(params, (96, 128), n_features=200, threshold=1e-5, pad_to=256)
        img = jax.random.uniform(jax.random.PRNGKey(4), (96, 128)) * 255.0
        return ext, ext(img)

    def test_shapes_and_masks(self, feats):
        ext, f = feats
        assert f.xy.shape == (256, 2)
        assert f.desc.shape == (256, 256)
        assert f.global_desc.shape == (4096,)
        assert bool(f.mask.any())
        # all valid keypoints inside the image
        m = np.array(f.mask)
        xy = np.array(f.xy)[m]
        assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 128 * 1.001).all()
        assert (xy[:, 1] >= 0).all() and (xy[:, 1] < 96 * 1.001).all()

    def test_descriptors_normalized(self, feats):
        _, f = feats
        m = np.array(f.mask)
        norms = np.linalg.norm(np.array(f.desc)[m], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_nms_separation_level0(self, feats):
        _, f = feats
        m = np.array(f.mask) & (np.array(f.octave) == 0)
        xy = np.array(f.xy)[m]
        if len(xy) > 1:
            d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
            d[np.arange(len(xy)), np.arange(len(xy))] = 1e9
            assert d.min() > 4.0

    def test_deterministic(self, feats, params):
        ext, f = feats
        img = jax.random.uniform(jax.random.PRNGKey(4), (96, 128)) * 255.0
        f2 = ext(img)
        np.testing.assert_array_equal(f.xy, f2.xy)
        np.testing.assert_array_equal(f.desc, f2.desc)


def test_refine_subpixel_recovers_gaussian_peak():
    """A Gaussian bump with a known fractional center: the 3-tap quadratic
    refinement must recover the subpixel offset to ~0.1 px and never move
    a keypoint by more than half a pixel."""
    import numpy as np
    import jax.numpy as jnp

    from hfnet_slam_tpu.ops import extract as X

    H, W = 32, 40
    cx, cy = 17.3, 11.6  # true subpixel peak
    ys, xs = np.mgrid[0:H, 0:W]
    s = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 1.5 ** 2))
    xy_int = np.array([[17.0, 12.0]], np.float32)  # integer argmax
    out = np.asarray(X.refine_subpixel(jnp.asarray(s.astype(np.float32)),
                                       jnp.asarray(xy_int)))
    assert abs(out[0, 0] - cx) < 0.1, out
    assert abs(out[0, 1] - cy) < 0.1, out
    assert np.all(np.abs(out - xy_int) <= 0.5 + 1e-6)
    # border keypoints stay put
    edge = np.array([[0.0, 5.0], [39.0, 31.0]], np.float32)
    out_e = np.asarray(X.refine_subpixel(jnp.asarray(s.astype(np.float32)),
                                         jnp.asarray(edge)))
    np.testing.assert_array_equal(out_e, edge)
