"""Stage-by-stage diagnostics for the fused VO pipeline.

Usage: python tools/debug_vo_fused.py [n_frames] [seed]
Prints per-stage ATE (chunk solves vs GT, composition, pose graph, global
BA), track-length distribution, and chunk health.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from feature_detector_tpu.core.config import (
    BAOptions, BriefOptions, DetectorOptions, MatcherOptions,
)
from feature_detector_tpu.slam import evaluate
from feature_detector_tpu.slam.sequence import (
    make_synthetic_sequence, sanitize_chunk_poses, scan_frontend_jit,
    build_tracks_conflict_free, _match_pairs_jit, _pair_ransac_jit,
)
from feature_detector_tpu.slam import vo_fused as VF


def ate_pct(positions, gt, span):
    ate = float(evaluate.ate_rmse(
        jnp.asarray(positions), jnp.asarray(gt), with_scale=True))
    return ate, 100.0 * ate / span


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chunk, overlap = 10, 4
    seq = make_synthetic_sequence(
        n_frames=n, n_landmarks=500 if n <= 40 else 900, seed=seed,
        motion="lateral", angle_step=0.03,
    )
    cam = seq.cam
    gt_pos = seq.trajectory.positions
    span = float(np.linalg.norm(gt_pos.max(0) - gt_pos.min(0)))
    det_opts = DetectorOptions(
        min_feature_distance=10, min_valid_response=20.0,
        max_features=256, subpixel=True,
    )
    brief_opts = BriefOptions(upright=True, blur_sigma=2.0)
    match_opts = MatcherOptions(ratio=0.85, max_distance=80)

    t0 = time.time()
    fe = scan_frontend_jit("harris", 200, det_opts, brief_opts)
    feats, words, dvalid, links = fe(jnp.asarray(seq.images))
    uv_np = np.asarray(feats.uv)
    valid_np = np.asarray(feats.valid)
    links_np = np.asarray(links)
    print(f"frontend: {time.time()-t0:.1f}s, feats/frame "
          f"{valid_np.sum(1).mean():.0f}")

    match_pairs = _match_pairs_jit(match_opts)
    ransac_gate = _pair_ransac_jit(cam)
    pair_matches = []
    sel = np.clip(links_np, 0, None)
    uv_b_sel = uv_np[1:][np.arange(n - 1)[:, None], sel]
    pair_valid = (links_np >= 0) & valid_np[:-1]
    inlier = np.asarray(ransac_gate(
        jnp.asarray(uv_np[:-1]), jnp.asarray(uv_b_sel), jnp.asarray(pair_valid)))
    for f in range(n - 1):
        pair_matches.append((f, f + 1, np.where(inlier[f], links_np[f], -1)))
    for off in (1, 2, 3, 4):
        m = match_pairs(words[:-off], dvalid[:-off], words[off:], dvalid[off:])
        midx = np.where(np.asarray(m.valid), np.asarray(m.index), -1)
        sel = np.clip(midx, 0, None)
        uv_b_sel = uv_np[off:][np.arange(n - off)[:, None], sel]
        pair_valid = (midx >= 0) & valid_np[:-off]
        inlier = np.asarray(ransac_gate(
            jnp.asarray(uv_np[:-off]), jnp.asarray(uv_b_sel),
            jnp.asarray(pair_valid)))
        for f in range(n - off):
            pair_matches.append((f, f + off, np.where(inlier[f], midx[f], -1)))
    tracks = build_tracks_conflict_free(pair_matches, n, det_opts.max_features)
    lens = np.asarray([len(tr) for tr in tracks])
    print(f"tracks: {len(tracks)}, len histo p50={np.percentile(lens,50):.0f} "
          f"p90={np.percentile(lens,90):.0f} max={lens.max()} "
          f">=5 obs: {(lens>=5).sum()}, >=8: {(lens>=8).sum()}")

    # chunk problems
    step = chunk - overlap
    starts = list(range(0, n - chunk + 1, step))
    if starts[-1] != n - chunk:
        starts.append(n - chunk)
    K = len(starts)
    Lc = 512
    track_uv_k = np.zeros((K, Lc, chunk, 2), np.float32)
    track_has_k = np.zeros((K, Lc, chunk), bool)
    for k, s in enumerate(starts):
        cand = []
        for tr in tracks:
            obs = [(f - s, i) for f, i in tr if s <= f < s + chunk]
            if len(obs) >= 2:
                cand.append(obs)
        cand.sort(key=len, reverse=True)
        for l, obs in enumerate(cand[:Lc]):
            for fl, i in obs:
                track_uv_k[k, l, fl] = uv_np[s + fl, i]
                track_has_k[k, l, fl] = True

    chunk_ba_opts = BAOptions(
        max_iterations=10, huber_delta=2.0, gate_px=3.0, gate_rounds=1)
    t0 = time.time()
    solver = VF._chunk_solver_jit(cam, chunk, 15, 2, chunk_ba_opts, 3.0)
    c_rots, c_trans, c_pts, c_haspt, c_ok, c_jstar = map(
        np.asarray, solver(jnp.asarray(track_uv_k), jnp.asarray(track_has_k)))
    print(f"chunk solve: {time.time()-t0:.1f}s, ok={c_ok.tolist()}, "
          f"jstar={c_jstar.tolist()}")

    # per-chunk ATE vs ground truth
    for k, s in enumerate(starts):
        c_loc = -np.einsum("fji,fj->fi", c_rots[k], c_trans[k])
        if not np.isfinite(c_loc).all():
            print(f"  chunk {k} [{s}:{s+chunk}]: NON-FINITE")
            continue
        ate, pct = ate_pct(c_loc, gt_pos[s:s + chunk],
                           float(np.linalg.norm(gt_pos[s + chunk - 1] - gt_pos[s])))
        print(f"  chunk {k} [{s}:{s+chunk}]: ate={ate:.4f} "
              f"({pct:.1f}% of chunk span), pts={c_haspt[k].sum()}")

    # composition
    rots_g = np.zeros((n, 3, 3), np.float32)
    centers_g = np.zeros((n, 3), np.float32)
    have = np.zeros(n, bool)
    chunk_scales = np.ones(K, np.float32)
    san_rots = np.zeros_like(c_rots)
    san_centers = np.zeros((K, chunk, 3), np.float32)
    prev_sc = 1.0
    for k, s in enumerate(starts):
        rot_l, tr_l = sanitize_chunk_poses(c_rots[k], c_trans[k], s)
        c_loc = -np.einsum("fji,fj->fi", rot_l, tr_l)
        san_rots[k] = rot_l
        san_centers[k] = c_loc
        if k == 0:
            rot_a, t_a, sc_a = np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 1.0
        else:
            shared_g = [f for f in range(s, s + chunk) if have[f]]
            shared_l = [f - s for f in shared_g]
            rot_a, t_a, sc_a = VF.sim3_align_overlap(
                rots_g, centers_g, rot_l, c_loc, shared_g, shared_l,
                s, chunk, prev_sc)
        prev_sc = sc_a
        chunk_scales[k] = sc_a
        for fl in range(chunk):
            f = s + fl
            if have[f]:
                continue
            rots_g[f] = rot_l[fl] @ rot_a.T
            centers_g[f] = sc_a * rot_a @ c_loc[fl] + t_a
            have[f] = True
    ate, pct = ate_pct(centers_g, gt_pos, span)
    print(f"composed: ATE {ate:.4f} ({pct:.2f}%), scales={np.round(chunk_scales,3).tolist()}")

    # pose graph
    rots_pg, centers_pg = VF._pose_graph_refine(
        rots_g.copy(), centers_g.copy(), san_rots, san_centers,
        chunk_scales, c_ok, starts)
    ate, pct = ate_pct(centers_pg, gt_pos, span)
    print(f"pose graph: ATE {ate:.4f} ({pct:.2f}%)")

    # per-chunk true scale vs composed scale
    for k, s in enumerate(starts):
        a = evaluate.umeyama_alignment(jnp.asarray(san_centers[k]),
                                       jnp.asarray(gt_pos[s:s+chunk]), with_scale=True)
        print(f"  chunk {k}: true scale {float(a.scale):.3f}, composed {chunk_scales[k]:.3f}")

    # global BA from each init
    for name, (rg, cg) in (("composed", (rots_g, centers_g)),
                           ("posegraph", (rots_pg, centers_pg))):
        trans_g = -np.einsum("fij,fj->fi", rg, cg)
        D = 8
        good = [tr for tr in tracks if len(tr) >= 2]
        L = len(good)
        Lp = ((L + 255) // 256) * 256
        obs_cam = np.full((Lp, D), -1, np.int32)
        obs_uv = np.zeros((Lp, D, 2), np.float32)
        for l, tr in enumerate(good):
            obs = tr
            if len(obs) > D:
                idx = np.unique(np.round(np.linspace(0, len(obs) - 1, D)).astype(int))
                obs = [obs[i] for i in idx]
            for d, (f, i) in enumerate(obs):
                obs_cam[l, d] = f
                obs_uv[l, d] = uv_np[f, i]
        tri = VF._triangulate_jit(cam, 12.0)
        pts0, obs_ok, has_pt = tri(jnp.asarray(rg), jnp.asarray(trans_g),
                                   jnp.asarray(obs_cam), jnp.asarray(obs_uv))
        print(f"  [{name}] tri: has_pt={int(np.asarray(has_pt).sum())}/{L}, "
              f"obs kept {int(np.asarray(obs_ok).sum())}/{int((obs_cam>=0).sum())}")
        from feature_detector_tpu.slam.ba import BAProblem, ba_solve, reprojection_cost
        prob = BAProblem(rot=jnp.asarray(rg), trans=jnp.asarray(trans_g),
                         points=pts0,
                         obs_cam=jnp.where(obs_ok, jnp.asarray(obs_cam), -1),
                         obs_uv=jnp.asarray(obs_uv))
        for tag, ba_opts, outer in (
            ("gated", BAOptions(max_iterations=12, huber_delta=2.0, gate_px=3.0, gate_rounds=2), 1),
            ("nogate", BAOptions(max_iterations=30, huber_delta=4.0, gate_px=0.0, mad_clip=0.0), 1),
            ("alt3", BAOptions(max_iterations=10, huber_delta=4.0, gate_px=0.0, mad_clip=0.0), 3),
            ("alt3gate", BAOptions(max_iterations=10, huber_delta=2.0, gate_px=3.0, gate_rounds=1), 3),
        ):
            t0 = time.time()
            cur = prob
            for it in range(outer):
                if it > 0:
                    pts_i, ok_i, _ = tri(cur.rot, cur.trans,
                                         jnp.asarray(obs_cam), jnp.asarray(obs_uv))
                    cur = cur._replace(points=pts_i,
                                       obs_cam=jnp.where(ok_i, jnp.asarray(obs_cam), -1))
                cur = ba_solve(cur, cam, ba_opts)
            cost1 = float(reprojection_cost(cur, cam, ba_opts))
            cg2 = -np.einsum("fji,fj->fi", np.asarray(cur.rot), np.asarray(cur.trans))
            ate, pct = ate_pct(cg2, gt_pos, span)
            print(f"  [{name}/{tag}] ({time.time()-t0:.1f}s): cost->{cost1:.3f}, ATE {ate:.4f} ({pct:.2f}%)")

        # alternating PnP + triangulate + BA (the chunk solver's recipe, globally)
        from feature_detector_tpu.slam import geometry
        ba_opts = BAOptions(max_iterations=10, huber_delta=2.0, gate_px=3.0, gate_rounds=1)
        t0 = time.time()
        rot_c = jnp.asarray(rg); trans_c = jnp.asarray(trans_g)
        oc = jnp.asarray(obs_cam); ouv = jnp.asarray(obs_uv)
        pts_c, ok_c, _ = tri(rot_c, trans_c, oc, ouv)
        for it in range(3):
            # per-frame PnP against current map: build per-frame obs lists (dense [F, L] via obs layout)
            # obs_cam [L, D] -> for frame f, points with an obs at f
            ocn = np.asarray(jnp.where(ok_c, oc, -1))
            ptsn = pts_c
            Lp = ocn.shape[0]
            r_list, t_list = [rot_c], []
            # vectorized per frame: mask[l,d] = ocn==f
            new_r = []; new_t = []
            for f in range(n):
                mask = ocn == f
                has = mask.any(1)
                d_idx = mask.argmax(1)
                uv_f = np.take_along_axis(np.asarray(ouv), d_idx[:,None,None].repeat(2,2), 1)[:,0]
                r2, t2 = geometry.pnp_solve(rot_c[f], trans_c[f], ptsn, jnp.asarray(uv_f), jnp.asarray(has), cam, iters=15, gate_px=3.0)
                new_r.append(r2); new_t.append(t2)
            rot_c = jnp.stack(new_r).at[0].set(jnp.eye(3))
            trans_c = jnp.stack(new_t).at[0].set(0.0)
            pts_c, ok_c, _ = tri(rot_c, trans_c, oc, ouv)
            cur = prob._replace(rot=rot_c, trans=trans_c, points=pts_c, obs_cam=jnp.where(ok_c, oc, -1))
            cur = ba_solve(cur, cam, ba_opts)
            rot_c, trans_c, pts_c = cur.rot, cur.trans, cur.points
            cg2 = -np.einsum("fji,fj->fi", np.asarray(rot_c), np.asarray(trans_c))
            ate, pct = ate_pct(cg2, gt_pos, span)
            print(f"  [{name}/altpnp it{it}] ATE {ate:.4f} ({pct:.2f}%) cost {float(reprojection_cost(cur, cam, ba_opts)):.3f}")
        print(f"  altpnp total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
