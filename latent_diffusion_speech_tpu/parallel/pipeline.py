"""Pipeline parallelism: GPipe-style microbatched stage execution over the
mesh 'pipe' axis.

The reference has no pipeline parallelism at all (SURVEY.md §2.8: DP-only via
HF accelerate); this substantiates the mesh's reserved 'pipe' axis the
TPU-first way: per-stage parameters live sharded over the pipe axis (leading
stage dim), the schedule is a `lax.scan` over ticks inside `shard_map`, and
the stage-to-stage handoff is a `ppermute` ring shift over ICI.  XLA sees ONE
compiled program; autodiff through `ppermute`/`scan` yields the standard
backward pipeline (reverse shifts), so the same op trains.

Composition with the other mesh axes
------------------------------------
The shard_map is *partially manual*: only the 'pipe' axis is manual
(`axis_names={pipe_axis}`); 'data', 'model', 'seq' and 'expert' stay under
GSPMD auto-sharding inside the body.  Stage params therefore keep any
tensor-parallel ('model') or expert-parallel ('expert') layout they carry —
XLA's SPMD partitioner inserts those collectives inside each pipeline stage,
composing pp x tp, pp x ep and dp x pp from the same op
(tests/test_pipeline.py, tests/test_moe.py pin the combinations).

Schedule
--------
`M` microbatches through `S` stages take `M + S - 1` ticks (bubble fraction
`(S-1)/(M+S-1)`).  At tick `t`, stage 0 ingests microbatch `t` (bubble ticks
recompute the last microbatch and their output is discarded), every stage
applies its layer block to its current activation, the last stage writes
result `t-(S-1)` into its output buffer, and activations ring-shift one stage
forward.  Outputs are broadcast from the last stage with a masked `psum`.

The activation may be an arbitrary pytree (e.g. `(hidden, attn_mask)`): the
whole tree is injected, shifted, and collected together, so per-microbatch
side inputs ride along with their microbatch.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from latent_diffusion_speech_tpu.parallel.mesh import AXIS_PIPE

__all__ = ["pipeline_apply", "stack_stage_params"]


def _varying(x, axis: str):
    """Mark an array device-varying over `axis` (shard_map VMA typing)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, (axis,), to="varying")
    return jax.lax.pvary(x, (axis,))  # jax < 0.9


def stack_stage_params(stage_param_list) -> Any:
    """Stack a list of per-stage param pytrees into one pytree whose leaves
    carry a leading stage axis — the layout `pipeline_apply` shards over
    'pipe'."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stage_param_list)


def pipeline_apply(
    mesh: Mesh,
    stage_fn: Callable[[Any, Any], Any],
    stage_params: Any,
    x: Any,
    *,
    pipe_axis: str = AXIS_PIPE,
    batch_axis: Optional[str] = None,
    remat: bool = False,
) -> Any:
    """Run `x` through `S` pipeline stages, GPipe-microbatched.

    Args:
      mesh: the global device mesh (must contain `pipe_axis`).
      stage_fn: `(params_for_one_stage, activation) -> activation` — must be
        shape-preserving on the activation pytree (homogeneous stages).
      stage_params: pytree whose leaves have leading dim S (one slice per
        stage), e.g. from `stack_stage_params`.  Sharded over `pipe_axis`;
        any sharding of the *remaining* dims over auto axes (e.g. 'model'
        tensor parallelism, 'expert' banks) is preserved inside the stage.
      x: activation pytree; every leaf is (M, mb, ...) — M microbatches of
        size mb.  (Callers microbatch by reshaping (B, ...) -> (M, B//M, ...).)
      batch_axis: optional mesh axis name sharding the microbatch dim (dim 1)
        of every activation leaf — combine data- and pipeline-parallelism.
        Applied as a GSPMD constraint (the axis stays auto).
      remat: rematerialize each stage application in the backward pass
        (activation memory falls from O(ticks) to O(ticks) boundaries only).

    Returns: pytree like `x` with every microbatch passed through all S
    stages, replicated over `pipe_axis`.
    """
    S = dict(mesh.shape)[pipe_axis]
    leaves = jax.tree_util.tree_leaves(x)
    if not leaves:
        raise ValueError("pipeline_apply: empty activation pytree")
    M = leaves[0].shape[0]
    if S == 1:
        # degenerate mesh: plain sequential scan over the stage axis
        def layer(h, p):
            return stage_fn(p, h), None

        out, _ = jax.lax.scan(layer, x, stage_params)
        return out

    fn = jax.checkpoint(stage_fn) if remat else stage_fn

    def constrain_batch(tree):
        if batch_axis is None:
            return tree
        # bare PartitionSpec: resolved against the shard_map body's context
        # mesh (whose 'pipe' axis is Manual) — a NamedSharding built from the
        # outer all-Auto mesh would fail the context-mesh consistency check
        return jax.tree_util.tree_map(
            lambda a: jax.lax.with_sharding_constraint(
                a, P(None, batch_axis, *([None] * (a.ndim - 2)))
            ),
            tree,
        )

    def run(params_local, x_local):
        # local param leaves are (1, ...): this device's single stage
        params_local = jax.tree_util.tree_map(lambda a: a[0], params_local)
        x_local = constrain_batch(x_local)
        idx = jax.lax.axis_index(pipe_axis)
        state = jax.tree_util.tree_map(
            lambda a: _varying(jnp.zeros_like(a[0]), pipe_axis), x_local
        )
        outputs = jax.tree_util.tree_map(
            lambda a: _varying(jnp.zeros_like(a), pipe_axis), x_local
        )

        def tick(carry, t):
            state, outputs = carry
            # stage 0 ingests microbatch t (clamped: bubble ticks recompute
            # the last microbatch; their output never lands in a valid slot)
            inj = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.minimum(t, M - 1), 0, keepdims=False
                ),
                x_local,
            )
            inp = jax.tree_util.tree_map(
                lambda i, s: jnp.where(idx == 0, i, s), inj, state
            )
            out = fn(params_local, inp)
            # last stage records microbatch t-(S-1); clamping to slot 0 is
            # safe — garbage writes at t < S-1 precede the valid write at
            # t = S-1 and are overwritten by it
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            outputs = jax.tree_util.tree_map(
                lambda o, v: jax.lax.dynamic_update_index_in_dim(o, v, widx, 0),
                outputs,
                out,
            )
            # ring-shift activations one stage forward (last -> first wraps;
            # the wrapped value is overwritten by stage 0's next injection)
            perm = [(i, (i + 1) % S) for i in range(S)]
            state = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, pipe_axis, perm), out
            )
            return (state, outputs), None

        (state, outputs), _ = jax.lax.scan(
            tick, (state, outputs), jnp.arange(M + S - 1)
        )
        # broadcast the last stage's buffer to the whole pipe group
        def bcast(o):
            masked = jnp.where(idx == S - 1, o, jnp.zeros_like(o))
            if o.dtype == jnp.bool_:  # psum has no bool reduction
                return jax.lax.psum(masked.astype(jnp.int8), pipe_axis).astype(bool)
            return jax.lax.psum(masked, pipe_axis)

        return jax.tree_util.tree_map(bcast, outputs)

    param_specs = jax.tree_util.tree_map(lambda _: P(pipe_axis), stage_params)
    act_specs = jax.tree_util.tree_map(lambda _: P(), x)
    return jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(param_specs, act_specs),
        out_specs=act_specs,
        axis_names={pipe_axis},
    )(stage_params, x)
