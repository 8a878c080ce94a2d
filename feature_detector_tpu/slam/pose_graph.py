"""Pose-graph optimization over SE(3) relative-pose constraints.

Completes the SLAM back-end (BASELINE.json north_star: "distributed bundle
adjustment + pose-graph back-end").  Fixed-shape edge list; Jacobians by
forward-mode autodiff of the residual w.r.t. minimal left perturbations
(vmapped per edge); dense Gauss-Newton with gauge fixed at node 0.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import BAOptions
from .lie import se3_compose, se3_inverse, se3_log, se3_update


class PoseGraph(NamedTuple):
    """rot [C, 3, 3], trans [C, 3]; edges i->j with measured relative pose
    T_ij = T_i^-1 T_j: edge_i/edge_j [E] int32 (-1 = padding),
    edge_rot [E, 3, 3], edge_trans [E, 3]."""

    rot: jnp.ndarray
    trans: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_rot: jnp.ndarray
    edge_trans: jnp.ndarray


def _edge_residual(ri, ti, rj, tj, r_ij, t_ij, di, dj):
    """Residual log(T_ij^-1 (T_i d_i)^-1 (T_j d_j)) for perturbations d."""
    ri, ti = se3_update(ri, ti, di)
    rj, tj = se3_update(rj, tj, dj)
    inv_ri, inv_ti = se3_inverse(ri, ti)
    rel_r, rel_t = se3_compose(inv_ri, inv_ti, rj, tj)
    inv_mr, inv_mt = se3_inverse(r_ij, t_ij)
    err_r, err_t = se3_compose(inv_mr, inv_mt, rel_r, rel_t)
    return se3_log(err_r, err_t)


@functools.partial(jax.jit, static_argnames=("opts",))
def pose_graph_solve(graph: PoseGraph, opts: BAOptions = BAOptions()) -> PoseGraph:
    with jax.default_matmul_precision("highest"):
        return _pose_graph_solve_impl(graph, opts)


def _pose_graph_solve_impl(graph: PoseGraph, opts: BAOptions) -> PoseGraph:
    n = graph.rot.shape[0]
    e = graph.edge_i.shape[0]
    valid = (graph.edge_i >= 0) & (graph.edge_j >= 0)
    ei = jnp.clip(graph.edge_i, 0, n - 1)
    ej = jnp.clip(graph.edge_j, 0, n - 1)

    zero6 = jnp.zeros(6)

    def residual_and_jac(ri, ti, rj, tj, mr, mt):
        f_i = lambda d: _edge_residual(ri, ti, rj, tj, mr, mt, d, zero6)
        f_j = lambda d: _edge_residual(ri, ti, rj, tj, mr, mt, zero6, d)
        r = f_i(zero6)
        Ji = jax.jacfwd(f_i)(zero6)
        Jj = jax.jacfwd(f_j)(zero6)
        return r, Ji, Jj

    batched_rj = jax.vmap(residual_and_jac)

    def body(_, state):
        rot, trans = state
        r, Ji, Jj = batched_rj(
            rot[ei], trans[ei], rot[ej], trans[ej], graph.edge_rot, graph.edge_trans
        )
        w = valid[:, None, None].astype(jnp.float32)
        Ji = Ji * w
        Jj = Jj * w
        rv = r * valid[:, None]

        H = jnp.zeros((n, 6, n, 6))
        H = H.at[ei, :, ei, :].add(jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[ej, :, ej, :].add(jnp.einsum("eki,ekj->eij", Jj, Jj))
        H = H.at[ei, :, ej, :].add(jnp.einsum("eki,ekj->eij", Ji, Jj))
        H = H.at[ej, :, ei, :].add(jnp.einsum("eki,ekj->eij", Jj, Ji))
        b = jnp.zeros((n, 6))
        b = b.at[ei].add(-jnp.einsum("eki,ek->ei", Ji, rv))
        b = b.at[ej].add(-jnp.einsum("eki,ek->ei", Jj, rv))

        Hf = H.reshape(6 * n, 6 * n)
        bf = b.reshape(-1)
        k = 6 * max(1, min(opts.num_fixed_cameras, n))
        Hf = Hf.at[:k, :].set(0.0).at[:, :k].set(0.0)
        Hf = Hf.at[jnp.arange(k), jnp.arange(k)].set(1.0)
        bf = bf.at[:k].set(0.0)
        diag = jnp.diagonal(Hf)
        Hf = Hf + jnp.diag(opts.damping * diag + 1e-6)

        dx = jax.scipy.linalg.solve(Hf, bf).reshape(n, 6)
        rot, trans = se3_update(rot, trans, dx)
        return rot, trans

    rot, trans = jax.lax.fori_loop(0, opts.max_iterations, body, (graph.rot, graph.trans))
    return graph._replace(rot=rot, trans=trans)
