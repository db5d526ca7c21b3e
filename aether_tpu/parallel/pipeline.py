"""GPipe-style pipeline parallelism for the scanned DiT block stack.

The reference has no pipeline parallelism at all (its only parallelism is
data-parallel eval sharding, ``evaluation/*/launch_aether.py``); this module is
a TPU-native scaling axis beyond it, for training/serving the 42-block DiT when
the parameter + optimizer state exceeds what dp x tp replication can hold.

Design (TPU / shard_map, scaling-book pipelining recipe):

- The DiT executes its blocks as ONE ``lax.scan`` over layer-stacked params
  (``models/dit.py``).  Pipeline parallelism slices that stack: the leading
  layer axis is sharded over the ``pp`` mesh axis (``shard_map`` in_spec
  ``P('pp', ...)`` on every block leaf), so each stage physically holds
  ``L/pp`` contiguous blocks — a 42-block model at pp=7 keeps 6 blocks of
  weights + optimizer state per stage.
- The batch is split into ``n_micro`` microbatches which stream through the
  stages GPipe-fashion: at tick ``t`` stage ``s`` runs microbatch ``t - s``
  through its local block slice and hands the activations to stage ``s+1``
  with a single ``ppermute`` hop over ICI.  ``n_micro + pp - 1`` ticks drain
  the pipeline; the bubble fraction is ``(pp-1)/(n_micro+pp-1)``.
- The tick loop is a ``lax.scan`` (compiler-friendly static control flow); all
  stages execute the same program (SPMD) and select their role with
  ``lax.axis_index('pp')`` + ``jnp.where`` — no data-dependent Python control
  flow under ``jit``.
- The whole executor is differentiable: ``jax.grad`` through ``shard_map`` +
  ``ppermute`` + ``lax.scan`` yields the reverse pipeline automatically (the
  transpose of a ``ppermute`` is the inverse permutation), i.e. GPipe
  forward-then-backward with the same bubble.
- Composition: the ``dp`` axis (when present in the same mesh) shards the
  microbatch batch dim — each dp shard runs an independent pipeline, no
  cross-talk.  ``tp``/``sp`` do NOT compose inside this executor (the
  attention's own ``shard_map`` cannot nest); pass ``mesh=None`` to
  ``dit_forward`` so every op inside the stage body stays device-local.

Memory note: this executor keeps the full microbatched input replicated across
stages and psum-broadcasts the output buffer at the end — simple and correct,
sized for the mechanism (the activations of one 15k-token window are ~MBs; the
thing pp exists to shard — 10.4 GB of weights x3 optimizer state — is what the
``P('pp')`` param sharding moves).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Carry = Tuple[jnp.ndarray, jnp.ndarray]  # (video_tokens, text_tokens)


def make_pp_mesh(pp: int, dp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'pp') mesh for the pipeline executor.

    'pp' is the fastest-varying axis so that consecutive stages land on
    ICI-adjacent devices (ppermute hops stay one-hop on a ring slice).
    """
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if dp * pp != len(devices):
        raise ValueError(f"dp({dp}) * pp({pp}) != num devices ({len(devices)})")
    arr = np.asarray(devices).reshape(dp, pp)
    return Mesh(arr, axis_names=("dp", "pp"))


def pp_block_sharding(blocks: Any, mesh: Mesh) -> Any:
    """``P('pp', None, ...)`` spec tree for a layer-stacked block param tree.

    Works for both the bf16 tree and the quantized ``{"q","s"}`` leaves — every
    leaf's leading axis is the layer axis.
    """
    return jax.tree_util.tree_map(
        lambda x: P("pp", *([None] * (jnp.ndim(x) - 1))), blocks
    )


def shard_blocks_pp(blocks: Any, mesh: Mesh) -> Any:
    """Device-put a stacked block tree with its layer axis sharded over 'pp'."""
    return jax.tree_util.tree_map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)),
        blocks,
        pp_block_sharding(blocks, mesh),
    )


def make_pipeline_block_scan(
    mesh: Mesh, n_micro: int
) -> Callable[[Callable, Carry, Any, jnp.ndarray], Carry]:
    """Build a ``block_scan`` executor for ``dit_forward``.

    Returns ``block_scan(body, carry, blocks, temb) -> carry`` where ``body``
    is the per-block function ``(carry, block_params, temb) -> (carry, None)``
    (the same body the default ``lax.scan`` path runs — one source of truth
    for the block math; pp changes only the execution schedule).

    Requirements checked at trace time:
    - mesh axes are a subset of {'pp', 'dp'} and contain 'pp';
    - the stacked layer count divides by pp (contiguous stage slices);
    - batch divides by ``n_micro`` (and the microbatch by dp when present).
    """
    if "pp" not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no 'pp' axis")
    extra = set(mesh.axis_names) - {"pp", "dp"}
    if extra:
        raise ValueError(
            f"pipeline executor composes with 'dp' only, got extra axes {extra} "
            "(tp/sp attention shard_map cannot nest inside the pp shard_map — "
            "pass mesh=None to dit_forward under pp)"
        )
    pp = mesh.shape["pp"]
    has_dp = "dp" in mesh.axis_names
    dp = mesh.shape["dp"] if has_dp else 1

    def block_scan(body, carry, blocks, temb):
        hid, enc = carry
        batch = hid.shape[0]
        if batch % n_micro != 0:
            raise ValueError(f"batch {batch} not divisible by n_micro {n_micro}")
        b_mb = batch // n_micro
        if b_mb % dp != 0:
            raise ValueError(f"microbatch {b_mb} not divisible by dp {dp}")
        n_layers = jax.tree_util.tree_leaves(blocks)[0].shape[0]
        if n_layers % pp != 0:
            raise ValueError(f"layers {n_layers} not divisible by pp {pp}")

        def split(x):
            return x.reshape(n_micro, b_mb, *x.shape[1:])

        hid_m, enc_m, temb_m = split(hid), split(enc), split(temb)

        # Microbatch tensors: replicated over pp, batch dim sharded over dp.
        def mb_spec(x):
            return P(None, "dp" if has_dp else None, *([None] * (x.ndim - 2)))

        act_specs = (mb_spec(hid_m), mb_spec(enc_m), mb_spec(temb_m))
        blk_specs = pp_block_sharding(blocks, mesh)

        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(blk_specs,) + act_specs,
            out_specs=(act_specs[0], act_specs[1]),
            check_vma=False,
        )
        def stage_fn(blocks_local, hid_m, enc_m, temb_m):
            stage = jax.lax.axis_index("pp")
            n_ticks = n_micro + pp - 1

            def run_local(h, e, t):
                (h, e), _ = jax.lax.scan(
                    lambda c, bp: body(c, bp, t), (h, e), blocks_local
                )
                return h, e

            def tick(state, t):
                (act_h, act_e), out_buf = state
                # stage 0 ingests microbatch t; stage s>0 consumes what
                # stage s-1 sent last tick (microbatch t - s)
                mb_in = jnp.clip(t, 0, n_micro - 1)
                h0 = jax.lax.dynamic_index_in_dim(hid_m, mb_in, 0, keepdims=False)
                e0 = jax.lax.dynamic_index_in_dim(enc_m, mb_in, 0, keepdims=False)
                first = stage == 0
                h_in = jnp.where(first, h0, act_h)
                e_in = jnp.where(first, e0, act_e)
                mb_here = jnp.clip(t - stage, 0, n_micro - 1)
                t_here = jax.lax.dynamic_index_in_dim(
                    temb_m, mb_here, 0, keepdims=False
                )
                h_out, e_out = run_local(h_in, e_in, t_here)

                # last stage banks finished microbatch t - (pp-1)
                wr = jnp.clip(t - (pp - 1), 0, n_micro - 1)
                valid = jnp.logical_and(stage == pp - 1, t >= pp - 1)
                bh, be = out_buf
                bh = jax.lax.dynamic_update_index_in_dim(
                    bh,
                    jnp.where(
                        valid,
                        h_out,
                        jax.lax.dynamic_index_in_dim(bh, wr, 0, keepdims=False),
                    ),
                    wr,
                    0,
                )
                be = jax.lax.dynamic_update_index_in_dim(
                    be,
                    jnp.where(
                        valid,
                        e_out,
                        jax.lax.dynamic_index_in_dim(be, wr, 0, keepdims=False),
                    ),
                    wr,
                    0,
                )

                perm = [(i, (i + 1) % pp) for i in range(pp)]
                act_h = jax.lax.ppermute(h_out, "pp", perm)
                act_e = jax.lax.ppermute(e_out, "pp", perm)
                return ((act_h, act_e), (bh, be)), None

            init = (
                (jnp.zeros_like(hid_m[0]), jnp.zeros_like(enc_m[0])),
                (jnp.zeros_like(hid_m), jnp.zeros_like(enc_m)),
            )
            (_, (bh, be)), _ = jax.lax.scan(
                tick, init, jnp.arange(n_ticks, dtype=jnp.int32)
            )
            # output lives on the last stage only; psum the masked buffer so
            # every stage leaves with the replicated result (out_spec P(None)
            # over pp)
            mask = (stage == pp - 1).astype(bh.dtype)
            bh = jax.lax.psum(bh * mask, "pp")
            be = jax.lax.psum(be * mask, "pp")
            return bh, be

        out_h, out_e = stage_fn(blocks, hid_m, enc_m, temb_m)
        merge = lambda x: x.reshape(batch, *x.shape[2:])
        return merge(out_h), merge(out_e)

    return block_scan
