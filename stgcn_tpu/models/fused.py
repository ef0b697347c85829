"""Whole-network eval forward built from the fused block megakernel.

Composes :func:`stgcn_tpu.kernels.block_fused.fused_block_vm` over the
model's block plan: BatchNorms fold into affines at trace time
(eval running stats), every block runs as ONE Pallas kernel with its
spatial->temporal intermediate VMEM-resident, and the only HBM traffic per
block is its input and output.  This is the serving forward for
``layout='vntc'``-class single-chip deployments; training uses the
megakernel through its custom VJP (block_fused_vjp) instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stgcn_tpu.kernels.block_fused import fused_block_vm
from stgcn_tpu.ops.batchnorm import fold_batchnorm_eval
from stgcn_tpu.ops.block import effective_adjacency
from stgcn_tpu.ops.common import linear


def fused_block_args(bp, bs, adjacency, *, residual: bool, c_in: int,
                     c_out: int, stride: int):
    """Fold one block's params/state into fused_block_vm arguments."""
    s1, t1 = fold_batchnorm_eval(bp["bn1"], bs["bn1"])
    s2, t2 = fold_batchnorm_eval(bp["bn2"], bs["bn2"])
    a_eff = effective_adjacency(bp, adjacency)
    wt = bp["temporal"]["w"][:, 0]
    wr = br = None
    if residual and "residual_proj" in bp:
        wr, br = bp["residual_proj"]["w"], bp["residual_proj"]["b"]
        shortcut = "proj"
    elif residual:
        shortcut = "id"
    else:
        shortcut = "none"
    return dict(
        s1=s1, t1=t1, w=bp["spatial"]["w"], b=bp["spatial"]["b"], a=a_eff,
        wt=wt, bt=bp["temporal"]["b"], s2=s2, t2=t2, wr=wr, br=br,
        stride=stride, order="pre" if residual else "post",
        shortcut=shortcut, relu1=residual)


def fused_eval_forward(model, params, state, x, *, interpret: bool = False,
                       precision=None, first_block: int = 0,
                       time_mask=None):
    """Eval-mode logits via one megakernel per block.

    Args:
      x: ``(N, T, V, C_in)`` batch (the standard collate layout).  With
        ``first_block=j`` (the hybrid path), ``x`` is block ``j``'s input —
        the ops-chain output of blocks ``0..j-1`` — and only the suffix runs
        fused.
      time_mask: optional ``(N, T)`` contiguous-prefix validity mask
        (bucketed collation).  Per-sequence lengths ride the kernels'
        scalar prefetch and the global pool averages valid frames only —
        the masked-semantics parity the ops path has (NTU-scale bucketed
        serving no longer forfeits the megakernels; VERDICT r4 weak-5).
        Masked batches run the unpacked megakernels (the packed chain
        assumes even frame counts per sequence).

    Returns ``(N, classes)`` logits (softmax applied if the config says so).
    """
    from stgcn_tpu.kernels.block_fused import block_tp
    from stgcn_tpu.kernels.block_packed import (
        block_rows,
        fused_block_packed_eval,
        packable,
    )

    cfg = model.config
    # Only the activations change dtype: the kernel casts each weight to the
    # activation dtype at its own pad step, and the BN affines fold (and
    # enter the kernel) in float32 regardless.
    x = x.astype(cfg.compute_dtype or cfg.dtype)
    seq_lens = None
    if time_mask is not None:
        # contiguous-prefix masks (wrap/bucket collation): frame counts
        seq_lens = jnp.sum(time_mask.astype(jnp.int32), axis=1)
        x = x * time_mask[:, :, None, None].astype(x.dtype)

    h = jnp.transpose(x, (2, 0, 1, 3))  # (V, N, T, C)
    n_seq = h.shape[1]
    # Chained padded-T layout: block i writes its output directly into the
    # T-padded buffer block i+1 reads, so no jnp.pad copy exists between
    # blocks (profiled at 16% of the unchained forward, PERF_r04.md).
    # C=64 stride-1 blocks run the PACKED megakernel (two frames per
    # 128-lane row, kernels/block_packed.py) with their own padded-ROW
    # chaining; the packed->unpacked boundary is a free reshape plus one
    # jnp.pad for the next block.
    t = h.shape[2]
    plan = cfg.plan[first_block:]
    lengths, strides = [t], [s for (_, s) in plan]
    for (_, s) in plan:
        pad_l = (cfg.gamma - 1) // 2
        t = (t + 2 * pad_l - cfg.gamma) // s + 1
        lengths.append(t)
    c_prev = cfg.c_in if first_block == 0 else cfg.plan[first_block - 1][0]
    chained = False        # unpacked padded-T chain state
    packed_chain = False   # packed padded-row chain state
    for i, (c_out, stride) in enumerate(plan):
        bi = first_block + i
        kw = fused_block_args(params["blocks"][bi], state["blocks"][bi],
                              model.adjacency, residual=cfg.residual,
                              c_in=c_prev, c_out=c_out, stride=stride)
        if time_mask is None and packable(c_out, stride, lengths[i],
                                          cfg.gamma):
            next_packed = (i + 1 < len(plan) and packable(
                plan[i + 1][0], plan[i + 1][1], lengths[i + 1], cfg.gamma))
            kw.pop("stride")
            h = fused_block_packed_eval(
                h, **kw,
                t_valid=lengths[i] if packed_chain else None,
                out_rows=(block_rows(lengths[i + 1], cfg.gamma)
                          if next_packed else None),
                interpret=interpret, precision=precision)
            if next_packed:
                packed_chain = True
            else:
                t2n = lengths[i + 1] // 2
                h = h[:, :, :t2n, :].reshape(
                    h.shape[0], n_seq, lengths[i + 1], c_out)
                packed_chain = False
            chained = False
        else:
            out_tp = (block_tp(lengths[i + 1], strides[i + 1], cfg.gamma)
                      if i + 1 < len(plan) else None)
            h = fused_block_vm(h, **kw,
                               t_valid=lengths[i] if chained else None,
                               out_tp=out_tp, lengths=seq_lens,
                               interpret=interpret, precision=precision)
            if seq_lens is not None:
                # per-sequence valid count after a same-pad strided conv:
                # ceil(len / stride) — identical to the ops path's
                # time_mask[::stride] slicing rule
                seq_lens = (seq_lens - 1) // stride + 1
            chained = out_tp is not None
        c_prev = c_out

    acc = jnp.promote_types(h.dtype, jnp.float32)
    if seq_lens is None:
        pooled = jnp.mean(h.astype(acc), axis=(0, 2))  # (N, C)
    else:
        # masked global mean: frames past each sequence's final length are
        # unspecified in the kernels' outputs and must not contribute
        valid = (jnp.arange(h.shape[2])[None, :]
                 < seq_lens[:, None])            # (N, T_final)
        m4 = valid[None, :, :, None].astype(acc)  # broadcast over (V, C)
        total = jnp.sum(h.astype(acc) * m4, axis=(0, 2))
        count = (seq_lens[:, None].astype(acc) * h.shape[0])
        pooled = total / jnp.maximum(count, 1.0)
    logits = linear(_cast_head(params["fc"], h.dtype),
                    pooled.astype(h.dtype), precision=precision)
    if cfg.final_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits


def _cast_head(fc: dict, dtype) -> dict:
    """Cast the classifier params to the activation dtype, matching the ops
    path (which casts ALL params to compute_dtype once at apply entry) so
    both block_impl paths share head numerics (r4 advisor item)."""
    return jax.tree.map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating)
        else p, fc)


# ---------------------------------------------------------------------------
# training path: the block as two fused ops + exact BatchNorm outside
# ---------------------------------------------------------------------------


def _bn_affine_train(bn_params, bn_state, x, *, momentum=0.1, eps=1e-5,
                     axis_name=None):
    """Batch-stat BN as a differentiable per-channel affine.

    Reduces over all leading axes of ``x`` (channels last), reproducing
    ops/batchnorm.batchnorm semantics exactly: float32 statistics, biased
    variance for normalization, unbiased variance into the running buffer.
    The returned (s, t) are functions of x through mean/var, so autodiff
    recovers the full BN gradient through the fused kernels' ds/dt.

    ``axis_name``: mesh axis (or axes) the batch is sharded over inside a
    ``shard_map`` — statistics are pmean-combined across shards so sharded
    BN sees exactly the global-batch statistics (the same cross-replica-BN
    property the GSPMD ops path gets for free; parallel/train.py).
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(xf, axis=axes)
    sqmean = jnp.mean(jnp.square(xf), axis=axes)
    n = 1
    for d in x.shape[:-1]:
        n *= d
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        sqmean = jax.lax.pmean(sqmean, axis_name)
        n *= jax.lax.axis_size(axis_name)  # static: global batch count
    var = sqmean - jnp.square(mean)
    unbiased = var * (n / max(n - 1, 1))
    new_state = {
        "mean": (1 - momentum) * bn_state["mean"]
        + momentum * jax.lax.stop_gradient(mean),
        "var": (1 - momentum) * bn_state["var"]
        + momentum * jax.lax.stop_gradient(unbiased),
    }
    s = bn_params["scale"].astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    t = bn_params["offset"].astype(jnp.float32) - mean * s
    return s, t, new_state


def block_forward_fused_train(bp, bs, x, adjacency, *, stride: int,
                              residual: bool, dropout_rate: float = 0.0,
                              dropout_rng=None, dropout_impl: str = "exact",
                              interpret: bool = False, precision=None,
                              axis_name=None):
    """One ST-GCN block, train mode, on V-major ``(V, N, T, C_in)``.

    Two fused Pallas ops (kernels/block_fused.spatial_block_vm /
    temporal_block_vm) carry all matmul work with the BN affines as
    differentiable inputs; the batch-stat reductions, shortcut add, final
    ReLU and dropout are XLA elementwise passes that fuse together.
    Parameters are IDENTICAL to init_block's.
    """
    from stgcn_tpu.kernels.block_fused import (
        spatial_block_vm,
        temporal_block_vm,
    )
    from stgcn_tpu.kernels.block_packed import (
        packable,
        spatial_block_packed,
        temporal_block_packed,
    )
    from stgcn_tpu.ops.block import effective_adjacency
    from stgcn_tpu.ops.common import dropout as dropout_op

    A = effective_adjacency(bp, adjacency).astype(x.dtype)
    wt = bp["temporal"]["w"][:, 0]
    c_out = wt.shape[-1]
    new_state = {}
    s1, t1, new_state["bn1"] = _bn_affine_train(bp["bn1"], bs["bn1"], x,
                                                axis_name=axis_name)

    # adjacency_mode="fixed" blocks carry no trained graph tensor — the
    # adjacency cotangent is unused, so the backward kernel skips its z_k
    # recompute (one stage1-size + one aggregation-size dot per partition)
    need_da = "A" in bp or "mask" in bp
    gamma = wt.shape[0]
    packed = packable(c_out, stride, x.shape[2], gamma)
    if packed:
        # C=64 stride-1 blocks: two frames per 128-lane row — kills the
        # cp=128 padding waste (4x on temporal taps, 2x on aggregation);
        # kernels/block_packed.py.  Output carries NO lane padding.
        z = spatial_block_packed(x, s1, t1,
                                 bp["spatial"]["w"].astype(x.dtype),
                                 bp["spatial"]["b"].astype(x.dtype), A,
                                 residual, interpret, precision, need_da)
    elif need_da and x.shape[-1] >= 256:
        # c256 blocks: the backward's z_k recompute is a stage-1-size dot
        # per partition at C_in=256 — saving the expansion costs ~125 MB of
        # activation traffic per block and removes ~0.5 ms of MXU work
        # (PERF_r05.md remaining-lever 1)
        from stgcn_tpu.kernels.block_fused import spatial_block_vm_save

        z = spatial_block_vm_save(x, s1, t1,
                                  bp["spatial"]["w"].astype(x.dtype),
                                  bp["spatial"]["b"].astype(x.dtype), A,
                                  residual, interpret, precision)
    else:
        z = spatial_block_vm(x, s1, t1, bp["spatial"]["w"].astype(x.dtype),
                             bp["spatial"]["b"].astype(x.dtype), A,
                             residual, interpret, precision, need_da)
    if residual:
        s2, t2, new_state["bn2"] = _bn_affine_train(
            bp["bn2"], bs["bn2"], z if packed else z[..., :c_out],
            axis_name=axis_name)
        if packed:
            u = temporal_block_packed(z, s2, t2, wt.astype(x.dtype),
                                      bp["temporal"]["b"].astype(jnp.float32),
                                      True, interpret, precision)
        else:
            u = temporal_block_vm(z, s2, t2, wt.astype(x.dtype),
                                  bp["temporal"]["b"].astype(jnp.float32),
                                  stride, True, interpret, precision)
        if "residual_proj" in bp:
            rp = bp["residual_proj"]
            short = x[:, :, ::stride] if stride != 1 else x
            short = (jnp.einsum("vnti,io->vnto", short,
                                rp["w"].astype(x.dtype),
                                precision=precision)
                     + rp["b"].astype(x.dtype))
        else:
            short = x
        out = jax.nn.relu(u.astype(jnp.float32)
                          + short.astype(jnp.float32)).astype(x.dtype)
    else:
        ident_s = jnp.ones((c_out,), jnp.float32)
        ident_t = jnp.zeros((c_out,), jnp.float32)
        if packed:
            u = temporal_block_packed(z, ident_s, ident_t,
                                      wt.astype(x.dtype),
                                      bp["temporal"]["b"].astype(jnp.float32),
                                      False, interpret, precision)
        else:
            u = temporal_block_vm(z, ident_s, ident_t, wt.astype(x.dtype),
                                  bp["temporal"]["b"].astype(jnp.float32),
                                  stride, False, interpret, precision)
        from stgcn_tpu.ops.batchnorm import batchnorm

        out, new_state["bn2"] = batchnorm(
            bp["bn2"], bs["bn2"], u, train=True,
            axis_names=(axis_name,) if axis_name is not None else None)
        out = jax.nn.relu(out)
    if dropout_rate > 0.0:
        if dropout_rng is None:
            raise ValueError("dropout_rate > 0 in train mode needs rng")
        out = dropout_op(dropout_rng, out, dropout_rate, train=True,
                         impl=dropout_impl)
    return out, new_state


def fused_train_forward(model, params, state, x, *, rng=None,
                        interpret: bool = False, precision=None,
                        axis_name=None, first_block: int = 0,
                        drop_keys=None):
    """Train-mode logits + new model state via the fused block ops.

    ``axis_name``: set when running per-shard inside a ``shard_map`` over a
    batch-sharded mesh axis (parallel/fused_dp.py) — BN statistics pmean
    across shards so sharded numerics match the single-device step.

    ``first_block``/``drop_keys``: the hybrid path runs blocks ``0..j-1``
    on the ops chain and hands block ``j``'s input here with the remaining
    dropout keys; the returned state carries only the suffix blocks.
    """
    cfg = model.config
    x = x.astype(cfg.compute_dtype or cfg.dtype)
    plan = cfg.plan[first_block:]
    if drop_keys is None:
        if cfg.dropout_rate > 0:
            if rng is None:
                raise ValueError("training with dropout needs rng")
            drop_keys = list(jax.random.split(rng, len(plan)))
        else:
            drop_keys = [None] * len(plan)

    h = jnp.transpose(x, (2, 0, 1, 3))  # (V, N, T, C)
    new_blocks_s = []
    for i, (c_out, stride) in enumerate(plan):
        bi = first_block + i
        h, s = block_forward_fused_train(
            params["blocks"][bi], state["blocks"][bi], h, model.adjacency,
            stride=stride, residual=cfg.residual,
            dropout_rate=cfg.dropout_rate, dropout_rng=drop_keys[i],
            dropout_impl=cfg.dropout_impl, interpret=interpret,
            precision=precision, axis_name=axis_name)
        new_blocks_s.append(s)

    acc = jnp.promote_types(h.dtype, jnp.float32)
    pooled = jnp.mean(h.astype(acc), axis=(0, 2))
    logits = linear(_cast_head(params["fc"], h.dtype),
                    pooled.astype(h.dtype), precision=precision)
    if cfg.final_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits, {"blocks": new_blocks_s}


# ---------------------------------------------------------------------------
# hybrid path: ops chain for the early blocks, fused kernels from fused_from
# ---------------------------------------------------------------------------
#
# Rationale (PERF_r04.md): the fused train path's extra FLOPs are
# concentrated in the C=64 blocks, whose cp=128 lane padding runs 2x-padded
# spatial and 4x-padded temporal dots; the C>=128 blocks pad nothing and
# keep the 36% HBM-traffic saving.  The hybrid runs blocks [0, fused_from)
# on the ops chain (ntvc, XLA conv) and [fused_from, n) on the fused
# V-major kernels.  The layout boundary costs ONE transpose of the
# fused_from block's input (~0.15 ms at B=64 — jnp.transpose inside
# fused_train_forward), not per-block copies.


def hybrid_fused_set(cfg) -> frozenset:
    """The block indices the hybrid runs fused: ``fused_blocks`` if given,
    else the ``[fused_from, n)`` suffix."""
    if cfg.fused_blocks is not None:
        return frozenset(cfg.fused_blocks)
    return frozenset(range(cfg.fused_from, len(cfg.plan)))


def _ops_block(model, params, state, h, i, stride, *, train, drop_key,
               precision, axis_name):
    """One ntvc ops block with the apply-entry param cast."""
    from stgcn_tpu.ops.block import block_forward

    cfg = model.config
    cd = cfg.compute_dtype
    cast = (lambda p: p.astype(cd)
            if cd is not None and jnp.issubdtype(p.dtype, jnp.floating)
            else p)
    bp = jax.tree.map(cast, params["blocks"][i])
    return block_forward(
        bp, state["blocks"][i], h, model.adjacency,
        stride=stride, residual=cfg.residual,
        dropout_rate=cfg.dropout_rate, train=train, dropout_rng=drop_key,
        bn_axis_names=(axis_name,) if axis_name is not None else None,
        precision=precision, temporal_impl=cfg.temporal_impl,
        compute_dtype=cd, spatial_impl=cfg.spatial_impl,
        dropout_impl=cfg.dropout_impl)


def hybrid_train_forward(model, params, state, x, *, rng=None,
                         interpret: bool = False, precision=None,
                         axis_name=None):
    """Train logits + state: each block on its cheaper regime.

    Blocks in :func:`hybrid_fused_set` run the fused V-major kernels
    (packed where eligible); the rest run the ntvc ops chain.  The layout
    transposes only at regime boundaries (~0.15 ms each at B=64 — cheap
    against the per-block deltas the r5 race measured).
    """
    cfg = model.config
    fused_set = hybrid_fused_set(cfg)
    n_blocks = len(cfg.plan)
    x = x.astype(cfg.compute_dtype or cfg.dtype)
    if cfg.dropout_rate > 0:
        if rng is None:
            raise ValueError("training with dropout needs rng")
        drop_keys = list(jax.random.split(rng, n_blocks))
    else:
        drop_keys = [None] * n_blocks

    h, layout = x, "ntvc"
    new_s = []
    for i, (c_out, stride) in enumerate(cfg.plan):
        want = "vntc" if i in fused_set else "ntvc"
        if want != layout:
            # (N,T,V,C) <-> (V,N,T,C)
            h = jnp.transpose(h, (2, 0, 1, 3) if want == "vntc"
                              else (1, 2, 0, 3))
            layout = want
        if want == "vntc":
            h, s = block_forward_fused_train(
                params["blocks"][i], state["blocks"][i], h, model.adjacency,
                stride=stride, residual=cfg.residual,
                dropout_rate=cfg.dropout_rate, dropout_rng=drop_keys[i],
                dropout_impl=cfg.dropout_impl, interpret=interpret,
                precision=precision, axis_name=axis_name)
        else:
            h, s = _ops_block(model, params, state, h, i, stride,
                              train=True, drop_key=drop_keys[i],
                              precision=precision, axis_name=axis_name)
        new_s.append(s)

    acc = jnp.promote_types(h.dtype, jnp.float32)
    pool_axes = (0, 2) if layout == "vntc" else (1, 2)
    pooled = jnp.mean(h.astype(acc), axis=pool_axes)
    logits = linear(_cast_head(params["fc"], h.dtype),
                    pooled.astype(h.dtype), precision=precision)
    if cfg.final_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits, {"blocks": new_s}


def hybrid_eval_forward(model, params, state, x, *, interpret: bool = False,
                        precision=None):
    """Eval logits: ops blocks on ntvc, fused runs as chained megakernels
    (padded-T chaining WITHIN each consecutive fused run)."""
    from stgcn_tpu.kernels.block_fused import block_tp

    cfg = model.config
    fused_set = hybrid_fused_set(cfg)
    x = x.astype(cfg.compute_dtype or cfg.dtype)
    pad_l = (cfg.gamma - 1) // 2
    c_prev = cfg.c_in

    h, layout = x, "ntvc"
    t = x.shape[1]
    chained = False
    for i, (c_out, stride) in enumerate(cfg.plan):
        want = "vntc" if i in fused_set else "ntvc"
        if want != layout:
            h = jnp.transpose(h, (2, 0, 1, 3) if want == "vntc"
                              else (1, 2, 0, 3))
            layout = want
            chained = False
        t_out = (t + 2 * pad_l - cfg.gamma) // stride + 1
        if want == "vntc":
            kw = fused_block_args(params["blocks"][i], state["blocks"][i],
                                  model.adjacency, residual=cfg.residual,
                                  c_in=c_prev, c_out=c_out, stride=stride)
            next_fused = (i + 1 < len(cfg.plan)) and (i + 1) in fused_set
            out_tp = (block_tp(t_out, cfg.plan[i + 1][1], cfg.gamma)
                      if next_fused else None)
            h = fused_block_vm(h, **kw, t_valid=t if chained else None,
                               out_tp=out_tp, interpret=interpret,
                               precision=precision)
            chained = out_tp is not None
        else:
            h, _ = _ops_block(model, params, state, h, i, stride,
                              train=False, drop_key=None,
                              precision=precision, axis_name=None)
        t = t_out
        c_prev = c_out

    acc = jnp.promote_types(h.dtype, jnp.float32)
    pool_axes = (0, 2) if layout == "vntc" else (1, 2)
    pooled = jnp.mean(h.astype(acc), axis=pool_axes)
    logits = linear(_cast_head(params["fc"], h.dtype),
                    pooled.astype(h.dtype), precision=precision)
    if cfg.final_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits
