"""Distributed JOINT visual-inertial bundle adjustment over a device mesh.

The reference's FullInertialBA covers every keyframe in ONE g2o problem
regardless of map size (/root/reference/src/Optimizer.cc:392-813). The
single-device joint solve here (optim/vi_ba.py) is capped by memory at
`fiba_max_joint` keyframes; past it, round 4 fell back to overlapping-chunk
Gauss-Seidel sweeps — an approximation on strongly-coupled maps. This
module removes that cap the TPU way (VERDICT r4 next #6):

  * LANDMARKS and their visual edges shard across the mesh exactly like
    the visual distributed BA (parallel/dist_ba.partition_edges — reused
    verbatim for the bucketing);
  * the 15-d keyframe chain (poses, velocities, biases) and the O(K)
    inertial links REPLICATE — they are tiny next to the landmark tables,
    and every device computes the identical inertial Hessian blocks;
  * per LM iteration the devices psum the visual contribution to the
    reduced camera system (Hbb, the Schur corner S_vis, rhs) — ONE
    collective of O(K^2*225) floats riding ICI — assemble the same
    (K,15,K,15) system optim/vi_ba.vi_ba_iterate builds, solve it
    replicated (Jacobi-scaled + one refinement step, f32-safe), and
    back-substitute only their own landmark slab;
  * accept/reject is in-graph on the psum of PER-EDGE visual cost
    differences plus the replicated inertial difference in the
    (r_new-r_old)(r_new+r_old) form (see vi_ba.cost_diff for why plain
    chi2 differences under-resolve in f32).

The public entry `dist_vi_bundle_adjust` consumes and returns the same
`VIBAProblem` the mapper already builds (local_mapping._build_inertial_
problem), so `full_inertial_ba` routes past `fiba_max_joint` with no
separate problem construction path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import lie
from ..geometry import imu
from ..optim import factors, vi_ba
from .dist_ba import partition_edges

_AXIS = "ba"


def _shard_caps(n_dev, n_mp, n_edges):
    """Per-device landmark/edge caps (pow2, exact coverage)."""
    ml = int(np.ceil(max(n_mp, 1) / n_dev))
    el = int(np.ceil(max(n_edges, 1) / n_dev))
    Ml = 1 << max(4, (ml - 1).bit_length())
    El = 1 << max(5, (el - 1).bit_length())
    return Ml, El


def shard_vi_problem(prob: vi_ba.VIBAProblem, n_dev: int):
    """Host-side packing of the visual part of a VIBAProblem into per-
    device slabs (landmarks round-robin, each edge with its landmark).
    Returns (vis: ShardedBA, maps) — reuses dist_ba.partition_edges; the
    ShardedBA's pose fields are ignored by this solver."""
    M = prob.points.shape[0]
    E = prob.uv.shape[0]
    Ml, El = _shard_caps(n_dev, M, E)
    K = prob.R_wb.shape[0]
    vis, maps = partition_edges(
        n_dev, K, Ml, El,
        np.tile(np.eye(3, dtype=np.float32), (K, 1, 1)),
        np.zeros((K, 3), np.float32), np.asarray(prob.fixed),
        np.asarray(prob.points), np.asarray(prob.kf_idx),
        np.asarray(prob.pt_idx), np.asarray(prob.uv),
        np.asarray(prob.inv_sigma2), np.asarray(prob.valid),
        z_meas=np.asarray(prob.z_meas), wz=np.asarray(prob.wz))
    return vis, maps


@functools.partial(jax.jit, static_argnames=("cam_kind", "mesh", "robust"))
def _dist_vi_lm_step(cam_kind, cam_params, prob: vi_ba.VIBAProblem,
                     pts_sh, kf_sh, pt_sh, uv_sh, is2_sh, val_sh, z_sh, wz_sh,
                     L9, Lg, La, mesh: Mesh, lam, robust: bool,
                     chi2_mono: float):
    """One distributed LM iteration on the joint VI problem. The sharded
    args carry the (D, ...) leading device axis; everything in `prob`
    except points/visual edges is replicated (its sharded fields are
    ignored). Returns (R,p,v,bg,ba, pts_sh', lam', cost, ok)."""
    K = prob.R_wb.shape[0]
    D15 = 15
    dt = prob.p_wb.dtype
    lam = jnp.asarray(lam, dt)
    max_step = jnp.asarray(0.5, dt)
    z9 = jnp.zeros(9)
    z30 = jnp.zeros(30)

    def vis_res(R_wb, p_wb, points, e_kf, e_pt, e_uv, e_z, e_wz, x9):
        Rb = R_wb[e_kf] @ lie.so3_exp(x9[:3])
        pb = p_wb[e_kf] + x9[3:6]
        R_cb = prob.Tbc_R.T
        R_cw = R_cb @ Rb.T
        t_cw = -R_cw @ pb - R_cb @ prob.Tbc_t
        r, _, _, depth = factors.reproj_depth_residual(
            cam_kind, cam_params, R_cw, t_cw, points[e_pt] + x9[6:9],
            e_uv, e_z, e_wz)
        return r, depth

    def link_res(R, p, v, bg, ba, l, x30):
        i, j = prob.li[l], prob.lj[l]
        xi, xj = x30[:15], x30[15:]
        Ri = R[i] @ lie.so3_exp(xi[:3])
        pi = p[i] + xi[3:6]
        Rj = R[j] @ lie.so3_exp(xj[:3])
        pj = p[j] + xj[3:6]
        pre_l = jax.tree.map(lambda a: a[l], prob.pre)
        r9 = L9[l] @ imu.inertial_residual(
            Ri, pi, v[i] + xi[6:9], bg[i] + xi[9:12], ba[i] + xi[12:15],
            Rj, pj, v[j] + xj[6:9], pre_l)
        rbg = Lg[l] @ (bg[j] + xj[9:12] - bg[i] - xi[9:12])
        rba = La[l] @ (ba[j] + xj[12:15] - ba[i] - xi[12:15])
        return jnp.concatenate([r9, rbg, rba])

    L = prob.li.shape[0]

    def step(R_wb, p_wb, v, bg, ba,
             pts, kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz):
        pts, kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz = (
            pts[0], kf_idx[0], pt_idx[0], uv[0], inv_s2[0], valid[0],
            z_meas[0], wz[0])
        Ml = pts.shape[0]
        E = uv.shape[0]
        delta2 = jnp.where(wz > 0, factors.CHI2_STEREO, chi2_mono)

        def vis_costs(Rw, pw, points):
            def one(e):
                r, depth = vis_res(Rw, pw, points, kf_idx[e], pt_idx[e],
                                   uv[e], z_meas[e], wz[e], z9)
                return r, depth
            r, depth = jax.vmap(one)(jnp.arange(E))
            chi2 = jnp.sum(r * r, -1) * inv_s2
            m = valid * (depth > 0)
            huber = jnp.where(chi2 <= delta2, chi2,
                              2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 0.0))
                              - delta2)
            return (huber if robust else chi2) * m

        # ---- visual terms (local edges) --------------------------------
        def vis_edge(e):
            f = lambda x: vis_res(R_wb, p_wb, pts, kf_idx[e], pt_idx[e],
                                  uv[e], z_meas[e], wz[e], x)[0]
            r, depth = vis_res(R_wb, p_wb, pts, kf_idx[e], pt_idx[e],
                               uv[e], z_meas[e], wz[e], z9)
            J = jax.jacfwd(f)(z9)
            return r, J[:, :6], J[:, 6:9], depth

        r, Jb, Jp, depth = jax.vmap(vis_edge)(jnp.arange(E))
        chi2 = jnp.sum(r * r, -1) * inv_s2
        w = inv_s2 * valid * (depth > 0)
        if robust:
            w = w * factors.huber_weight(chi2, delta2)

        JbW = Jb * w[:, None, None]
        Hbb_p = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JbW, Jb),
                                    kf_idx, K)
        bb_p = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JbW, r), kf_idx, K)
        JpW = Jp * w[:, None, None]
        Hpp = jax.ops.segment_sum(jnp.einsum("eri,erj->eij", JpW, Jp),
                                  pt_idx, Ml)
        bp = jax.ops.segment_sum(jnp.einsum("eri,er->ei", JpW, r), pt_idx, Ml)
        Wcp = jax.ops.segment_sum(
            jnp.einsum("eri,erj->eij", JbW, Jp), pt_idx * K + kf_idx, Ml * K
        ).reshape(Ml, K, 6, 3)

        from ..optim.ba import inv3_sym

        Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1)
                       + 1e-8)[..., None] * jnp.eye(3, dtype=dt)
        Hpp_inv = inv3_sym(Hpp_d)
        WHinv = jnp.einsum("mkac,mcd->mkad", Wcp, Hpp_inv)
        S_vis_p = -jnp.einsum("mkad,mled->kale", WHinv, Wcp)
        rhs_vis_p = -bb_p + jnp.einsum("mkad,md->ka", WHinv, bp)

        # ---- the one collective: visual camera system over the mesh ----
        Hbb = jax.lax.psum(Hbb_p, _AXIS)
        S_vis = jax.lax.psum(S_vis_p, _AXIS)
        rhs_vis = jax.lax.psum(rhs_vis_p, _AXIS)

        # ---- inertial terms (replicated; identical on every device) ----
        def in_link(l):
            f = lambda x: link_res(R_wb, p_wb, v, bg, ba, l, x)
            return f(z30), jax.jacfwd(f)(z30)

        rl, Jl = jax.vmap(in_link)(jnp.arange(L))
        Hl = jnp.einsum("lri,lrj->lij", Jl, Jl)
        bl = jnp.einsum("lri,lr->li", Jl, rl)

        # ---- assemble the (K,15,K,15) system (as vi_ba_iterate) --------
        S = jnp.zeros((K, D15, K, D15), dt)
        S = S.at[:, :6, :, :6].add(S_vis)
        S = S.at[jnp.arange(K), :6, jnp.arange(K), :6].add(Hbb)
        Sf = S.transpose(0, 2, 1, 3).reshape(K * K, D15, D15)
        ij = lambda a, b: a * K + b
        Sf = Sf.at[ij(prob.li, prob.li)].add(Hl[:, :15, :15])
        Sf = Sf.at[ij(prob.li, prob.lj)].add(Hl[:, :15, 15:])
        Sf = Sf.at[ij(prob.lj, prob.li)].add(Hl[:, 15:, :15])
        Sf = Sf.at[ij(prob.lj, prob.lj)].add(Hl[:, 15:, 15:])
        S = Sf.reshape(K, K, D15, D15).transpose(0, 2, 1, 3)
        S = S.at[0, 9:12, 0, 9:12].add(prob.prior_g * jnp.eye(3))
        S = S.at[0, 12:15, 0, 12:15].add(prob.prior_a * jnp.eye(3))

        rhs = jnp.zeros((K, D15), dt)
        rhs = rhs.at[:, :6].add(rhs_vis)
        rhs = rhs.at[prob.li].add(-bl[:, :15])
        rhs = rhs.at[prob.lj].add(-bl[:, 15:])

        diag = jnp.einsum("kaka->ka", S)
        S = S + (lam * diag + 1e-8)[:, :, None, None] * \
            jnp.eye(D15)[None, :, None, :] * jnp.eye(K)[:, None, :, None]
        pose_rows = (jnp.arange(D15) < 6)[None, :]
        free = ((~prob.fixed)[:, None] &
                ~(prob.fix_pose_only[:, None] & pose_rows)).astype(dt)
        S = S * free[:, :, None, None] * free[None, None, :, :]
        S = S.at[jnp.arange(K), :, jnp.arange(K), :].add(
            jnp.eye(D15)[None] * (1.0 - free)[:, :, None])
        rhs = rhs * free

        Sm = S.reshape(K * D15, K * D15)
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(Sm), 1e-12))
        Sm = Sm / d[:, None] / d[None, :]
        b = rhs.reshape(K * D15) / d
        y = jnp.linalg.solve(Sm, b)
        y = y + jnp.linalg.solve(Sm, b - Sm @ y)  # one refinement step
        dx = (y / d).reshape(K, D15)
        dx = dx * free
        step_n = jnp.sqrt(jnp.sum(dx * dx, -1))
        dx = dx * jnp.minimum(1.0, max_step / jnp.maximum(
            jnp.max(step_n), 1e-12))

        # ---- landmark back-substitution (local slab) -------------------
        Hpc_dc = jnp.einsum("mkac,ka->mc", Wcp, dx[:, :6])
        dp = jnp.einsum("mcd,md->mc", Hpp_inv, -bp - Hpc_dc)
        pstep = jnp.sqrt(jnp.sum(dp * dp, -1))
        dp = dp * jnp.minimum(1.0, max_step / jnp.maximum(
            pstep, 1e-12))[:, None]

        R_new = jax.vmap(lambda Rk, dd: Rk @ lie.so3_exp(dd))(R_wb, dx[:, :3])
        R_new = lie.orthonormalize(R_new).astype(dt)
        p_new = p_wb + dx[:, 3:6]
        v_new = v + dx[:, 6:9]
        bg_new = bg + dx[:, 9:12]
        ba_new = ba + dx[:, 12:15]
        pts_new = pts + dp

        # ---- accept/reject: psum of per-edge visual diffs + replicated
        # inertial diff in the precision-preserving product form ---------
        cv_old = vis_costs(R_wb, p_wb, pts)
        cv_new = vis_costs(R_new, p_new, pts_new)
        dv = jax.lax.psum(jnp.sum(cv_new - cv_old), _AXIS)
        ro = jax.vmap(lambda l: link_res(R_wb, p_wb, v, bg, ba, l, z30))(
            jnp.arange(L))
        rn = jax.vmap(lambda l: link_res(R_new, p_new, v_new, bg_new,
                                         ba_new, l, z30))(jnp.arange(L))
        dl = jnp.sum(jnp.sum((rn - ro) * (rn + ro), -1) * prob.lvalid)
        dcost = dv + dl
        bad_local = (~jnp.all(jnp.isfinite(dp))).astype(jnp.int32)
        ok = (dcost < 0) & jnp.all(jnp.isfinite(dx)) \
            & (jax.lax.psum(bad_local, _AXIS) == 0)
        pick = lambda a, b: jnp.where(ok, a, b)
        cost = jax.lax.psum(jnp.sum(jnp.where(ok, cv_new, cv_old)), _AXIS) \
            + jnp.sum(jnp.sum(jnp.where(ok, rn, ro) ** 2, -1) * prob.lvalid)
        lam_new = jnp.where(ok, jnp.maximum(lam * 0.33, 1e-5),
                            jnp.minimum(lam * 4.0, 1e4))
        return (pick(R_new, R_wb), pick(p_new, p_wb), pick(v_new, v),
                pick(bg_new, bg), pick(ba_new, ba),
                pick(pts_new, pts)[None], lam_new[None], cost[None],
                ok[None])

    f = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS),
                  P(_AXIS), P(_AXIS), P(_AXIS)),
        out_specs=(P(), P(), P(), P(), P(),
                   P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS)),
    )
    R, p, v, bg, ba, pts, lam_new, cost, ok = f(
        prob.R_wb, prob.p_wb, prob.v, prob.bg, prob.ba,
        pts_sh, kf_sh, pt_sh, uv_sh, is2_sh, val_sh, z_sh, wz_sh)
    return R, p, v, bg, ba, pts, lam_new[0], cost[0], ok[0]


@functools.partial(jax.jit, static_argnames=("cam_kind", "mesh"))
def _dist_vi_classify(cam_kind, cam_params, prob: vi_ba.VIBAProblem,
                      pts_sh, kf_sh, pt_sh, uv_sh, is2_sh, val_sh, z_sh,
                      wz_sh, mesh: Mesh, chi2_mono: float):
    """Per-edge visual chi2 gate over the mesh (outlier recycling)."""
    z9 = jnp.zeros(9)

    def cls(R_wb, p_wb, pts, kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz):
        pts, kf_idx, pt_idx, uv, inv_s2, valid, z_meas, wz = (
            pts[0], kf_idx[0], pt_idx[0], uv[0], inv_s2[0], valid[0],
            z_meas[0], wz[0])
        E = uv.shape[0]

        def one(e):
            Rb = R_wb[kf_idx[e]] @ lie.so3_exp(z9[:3])
            pb = p_wb[kf_idx[e]] + z9[3:6]
            R_cb = prob.Tbc_R.T
            R_cw = R_cb @ Rb.T
            t_cw = -R_cw @ pb - R_cb @ prob.Tbc_t
            r, _, _, depth = factors.reproj_depth_residual(
                cam_kind, cam_params, R_cw, t_cw, pts[pt_idx[e]] + z9[6:9],
                uv[e], z_meas[e], wz[e])
            return r, depth

        r, depth = jax.vmap(one)(jnp.arange(E))
        chi2 = jnp.sum(r * r, -1) * inv_s2
        th = jnp.where(wz > 0, factors.CHI2_STEREO, chi2_mono)
        return (valid & (chi2 <= th) & (depth > 0))[None]

    g = jax.shard_map(
        cls, mesh=mesh,
        in_specs=(P(), P(), P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS),
                  P(_AXIS), P(_AXIS), P(_AXIS), P(_AXIS)),
        out_specs=P(_AXIS))
    return g(prob.R_wb, prob.p_wb, pts_sh, kf_sh, pt_sh, uv_sh, is2_sh,
             val_sh, z_sh, wz_sh)


def dist_vi_bundle_adjust(cam_kind, cam_params, prob: vi_ba.VIBAProblem,
                          mesh: Mesh, rounds=((5, True), (10, True)),
                          chi2_mono: float = factors.CHI2_MONO,
                          should_abort=None) -> vi_ba.VIBAProblem:
    """Distributed counterpart of optim/vi_ba.vi_bundle_adjust: same input
    problem, same LM schedule + visual-outlier recycling between rounds,
    landmarks sharded over `mesh`. Returns the updated VIBAProblem (points
    gathered back to the dense layout; the `valid` field carries the final
    edge classification)."""
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    vis, (owner, local, okm) = shard_vi_problem(prob, n_dev)
    L9, Lg, La = vi_ba._link_whiteners(prob)
    pts_sh = vis.points
    base_valid = np.asarray(vis.valid)
    val_sh = vis.valid
    lam = 1e-3
    for n_iters, robust in rounds:
        for _ in range(n_iters):
            if should_abort is not None and should_abort():
                break
            R, p, v, bg, ba, pts_sh, lam, _c, _ok = _dist_vi_lm_step(
                cam_kind, cam_params, prob, pts_sh, vis.kf_idx, vis.pt_idx,
                vis.uv, vis.inv_sigma2, val_sh, vis.z_meas, vis.wz,
                L9, Lg, La, mesh, lam, robust, chi2_mono)
            prob = prob._replace(R_wb=R, p_wb=p, v=v, bg=bg, ba=ba)
        new_valid = np.asarray(_dist_vi_classify(
            cam_kind, cam_params, prob, pts_sh, vis.kf_idx, vis.pt_idx,
            vis.uv, vis.inv_sigma2, jnp.asarray(base_valid), vis.z_meas,
            vis.wz, mesh, chi2_mono))
        val_sh = jnp.asarray(base_valid & new_valid)

    # gather landmarks back into the dense (M,3) layout
    pts_np = np.asarray(pts_sh)
    points = np.asarray(prob.points).copy()
    m_all = np.arange(len(points))
    sel = okm
    points[m_all[sel]] = pts_np[owner[sel], local[sel]]
    # edge validity back to the dense (E,) layout: re-run the packing
    # permutation in reverse via a scatter of the sharded validity
    valid_out = np.asarray(prob.valid).copy()
    # classification gated edges only; edges dropped by packing keep base
    vis_valid = np.asarray(val_sh)
    # recompute the packing order to map (d, pos) -> dense edge id
    pt_idx = np.asarray(prob.pt_idx)
    e_sel = np.nonzero(np.asarray(prob.valid, bool) & okm[pt_idx])[0]
    if len(e_sel):
        d_e = owner[pt_idx[e_sel]]
        order = np.argsort(d_e, kind="stable")
        e_sel, d_e = e_sel[order], d_e[order]
        starts = np.searchsorted(d_e, np.arange(n_dev))
        pos = np.arange(len(e_sel)) - starts[d_e]
        keep = pos < vis_valid.shape[1]
        valid_out[e_sel[keep]] = vis_valid[d_e[keep], pos[keep]]
    return prob._replace(points=jnp.asarray(points),
                         valid=jnp.asarray(valid_out))
