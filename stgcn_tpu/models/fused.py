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
                       precision=None):
    """Eval-mode logits via one megakernel per block.

    Args:
      x: ``(N, T, V, C_in)`` batch (the standard collate layout).

    Returns ``(N, classes)`` logits (softmax applied if the config says so).
    """
    cfg = model.config
    # Only the activations change dtype: the kernel casts each weight to the
    # activation dtype at its own pad step, and the BN affines fold (and
    # enter the kernel) in float32 regardless.
    x = x.astype(cfg.compute_dtype or cfg.dtype)

    h = jnp.transpose(x, (2, 0, 1, 3))  # (V, N, T, C)
    c_prev = cfg.c_in
    for i, (c_out, stride) in enumerate(cfg.plan):
        kw = fused_block_args(params["blocks"][i], state["blocks"][i],
                              model.adjacency, residual=cfg.residual,
                              c_in=c_prev, c_out=c_out, stride=stride)
        # BN affines fold in float32 regardless of the compute dtype
        h = fused_block_vm(h, **kw, interpret=interpret, precision=precision)
        c_prev = c_out

    acc = jnp.promote_types(h.dtype, jnp.float32)
    pooled = jnp.mean(h.astype(acc), axis=(0, 2))  # (N, C)
    logits = linear(params["fc"], pooled.astype(h.dtype), precision=precision)
    if cfg.final_softmax:
        logits = jax.nn.softmax(logits, axis=-1)
    return logits
