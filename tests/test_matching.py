import jax
import jax.numpy as jnp
import numpy as np

from hfnet_slam_tpu.ops import matching as M


def make_descs(key, n, d=32):
    x = jax.random.normal(key, (n, d))
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


class TestMatchDescriptors:
    def test_perfect_permutation(self):
        dA = make_descs(jax.random.PRNGKey(0), 64)
        perm = jax.random.permutation(jax.random.PRNGKey(1), 64)
        dB = dA[perm]
        mask = jnp.ones(64, bool)
        idx, dist = M.match_descriptors(dA, mask, dB, mask, max_dist=0.6)
        # idx should invert the permutation: dB[idx[i]] == dA[i]
        inv = np.empty(64, int)
        inv[np.array(perm)] = np.arange(64)
        np.testing.assert_array_equal(np.array(idx), inv)
        np.testing.assert_allclose(dist, 0.0, atol=1e-3)

    def test_noise_rejected(self):
        dA = make_descs(jax.random.PRNGKey(2), 32)
        dB = make_descs(jax.random.PRNGKey(3), 32)  # unrelated
        mask = jnp.ones(32, bool)
        idx, _ = M.match_descriptors(dA, mask, dB, mask, max_dist=0.6)
        # random 32-d unit vectors have distance ~sqrt(2); nearly all rejected
        assert int((idx >= 0).sum()) <= 3

    def test_mask_respected(self):
        dA = make_descs(jax.random.PRNGKey(4), 16)
        dB = dA
        mA = jnp.arange(16) < 8
        mB = jnp.ones(16, bool)
        idx, _ = M.match_descriptors(dA, mA, dB, mB, max_dist=0.6)
        assert (np.array(idx[8:]) == -1).all()
        np.testing.assert_array_equal(np.array(idx[:8]), np.arange(8))

    def test_mutual_check(self):
        # B contains two near-duplicates of A[0]; crosscheck keeps 1-to-1
        dA = make_descs(jax.random.PRNGKey(5), 4)
        dB = jnp.concatenate([dA[:1], dA[:1] * 0.999 + 0.001, dA[1:]], axis=0)
        dB = dB / jnp.linalg.norm(dB, axis=-1, keepdims=True)
        mA = jnp.ones(4, bool)
        mB = jnp.ones(5, bool)
        idx, _ = M.match_descriptors(dA, mA, dB, mB, max_dist=0.6, mutual=True)
        matched = np.array(idx)
        # every match must be unique
        pos = matched[matched >= 0]
        assert len(pos) == len(set(pos))

    def test_ratio_test(self):
        # two B descriptors nearly equidistant from A[0] -> ratio gate kills it
        base = make_descs(jax.random.PRNGKey(6), 1)[0]
        n1 = base + 0.05 * make_descs(jax.random.PRNGKey(7), 1)[0]
        n2 = base + 0.05 * make_descs(jax.random.PRNGKey(8), 1)[0]
        dB = jnp.stack([n1 / jnp.linalg.norm(n1), n2 / jnp.linalg.norm(n2)])
        dA = base[None]
        idx, _ = M.match_descriptors(
            dA, jnp.ones(1, bool), dB, jnp.ones(2, bool), max_dist=0.6, ratio=0.9, mutual=False
        )
        assert int(idx[0]) == -1

    def test_window_gating(self):
        dA = make_descs(jax.random.PRNGKey(9), 8)
        dB = dA
        xyA = jnp.arange(8, dtype=jnp.float32)[:, None].repeat(2, 1) * 10
        xyB = xyA + 100.0  # all far away
        allowed = M.window_allowed(xyA, xyB, radius=5.0)
        idx, _ = M.match_descriptors(
            dA, jnp.ones(8, bool), dB, jnp.ones(8, bool), max_dist=0.6, allowed=allowed
        )
        assert (np.array(idx) == -1).all()


class TestRetrieval:
    def test_self_score_is_one(self):
        g = make_descs(jax.random.PRNGKey(10), 5, d=64)
        sc = M.global_scores(g[2], g, jnp.ones(5, bool))
        assert float(sc[2]) == 1.0
        assert sc.argmax() == 2

    def test_mask(self):
        g = make_descs(jax.random.PRNGKey(11), 5, d=64)
        sc = M.global_scores(g[2], g, jnp.arange(5) < 2)
        assert float(sc[2]) == 0.0

    def test_batch_consistency(self):
        g = make_descs(jax.random.PRNGKey(12), 7, d=64)
        q = make_descs(jax.random.PRNGKey(13), 3, d=64)
        mask = jnp.ones(7, bool)
        batch = M.global_scores_batch(q, g, mask)
        for i in range(3):
            np.testing.assert_allclose(batch[i], M.global_scores(q[i], g, mask), atol=1e-5)


def test_distinctive_descriptors_min_median():
    """Best descriptor = the observation with the smallest median distance
    to the others (ComputeDistinctiveDescriptors, src/MapPoint.cc)."""
    import jax.numpy as jnp
    from hfnet_slam_tpu.ops import matching as M

    rng = np.random.default_rng(0)
    # point 0: 4 obs, three clustered + one outlier -> winner in cluster
    base = rng.standard_normal(16).astype(np.float32)
    base /= np.linalg.norm(base)
    obs = np.stack([base + rng.normal(0, 0.01, 16).astype(np.float32) for _ in range(3)]
                   + [-base])
    obs /= np.linalg.norm(obs, axis=1, keepdims=True)
    descs = np.zeros((2, 4, 16), np.float32)
    mask = np.zeros((2, 4), bool)
    descs[0] = obs
    mask[0] = True
    # point 1: single obs
    descs[1, 0] = base
    mask[1, 0] = True
    best = np.asarray(M.distinctive_descriptors(jnp.asarray(descs), jnp.asarray(mask)))
    assert best[0] @ base > 0.99       # cluster member, not the outlier
    np.testing.assert_allclose(best[1], base, atol=1e-6)
