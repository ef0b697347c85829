"""Small shared ops: dropout, pooling, linear head.

Counterparts of the reference's ``nn.Dropout`` (src/network/
st_graphconv.py:53-58), ``F.avg_pool2d`` global pool (src/lightning_model.py:105)
and ``nn.Linear`` classifier head (src/lightning_model.py:88).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from stgcn_tpu.ops.dtypes import acc_dtype
from stgcn_tpu.ops.initializers import kaiming_uniform_torch, torch_bias_uniform


def dropout(key: jax.Array, x: jax.Array, rate: float, *, train: bool,
            impl: str = "exact") -> jax.Array:
    """Inverted dropout, matching torch's train-time scaling by 1/(1-p).

    ``impl="bits8"`` thresholds 8-bit random integers instead of drawing a
    float32 uniform per element: the RNG emits 4x fewer bits and the mask
    fusion reads u8 instead of u32 (the r3 profile shows the u32 mask
    traffic costing ~2 ms/step at B=64).  The keep probability quantizes to
    round(keep*256)/256 — EXACT for the reference's p=0.5 — and the
    1/keep rescale uses the effective probability, so the op stays unbiased
    for every rate.
    """
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    if impl == "bits8":
        thresh = int(round(keep * 256))
        if 0 < thresh < 256:
            n = x.size
            n4 = -(-n // 4)
            raw = jax.random.bits(key, (n4,), dtype=jnp.uint32)
            bits = jax.lax.bitcast_convert_type(raw, jnp.uint8).reshape(-1)
            if bits.size != n:
                bits = bits[:n]
            mask = (bits < thresh).reshape(x.shape)
            keep_eff = thresh / 256.0
            return jnp.where(mask, x / keep_eff, 0.0).astype(x.dtype)
        # degenerate quantization (rate < 1/512 or > 1 - 1/512): exact path
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def global_avg_pool(x: jax.Array, time_mask: jax.Array | None = None) -> jax.Array:
    """Mean over (T, V): ``(N, T, V, C) -> (N, C)``.

    ``time_mask`` (``(N, T)`` booleans) enables masked pooling for
    length-bucketed batches; with ``None`` this matches the reference's
    ``avg_pool2d(x, (T, V))`` over wrap-padded batches exactly.
    """
    acc = acc_dtype(x)  # accumulate the (T*V)-element mean in >= float32
    if time_mask is None:
        return jnp.mean(x.astype(acc), axis=(1, 2))
    m = time_mask[:, :, None, None].astype(acc)
    total = jnp.sum(x.astype(acc) * m, axis=(1, 2))
    count = jnp.sum(m, axis=(1, 2)) * x.shape[2]
    return total / jnp.maximum(count, 1.0)


def init_linear(key: jax.Array, c_in: int, c_out: int, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    return {
        "w": kaiming_uniform_torch(kw, (c_in, c_out), c_in, dtype),
        "b": torch_bias_uniform(kb, (c_out,), c_in, dtype),
    }


def linear(params: dict, x: jax.Array, *, precision=None) -> jax.Array:
    out = jnp.dot(x, params["w"], precision=precision,
                  preferred_element_type=acc_dtype(x))
    return (out + params["b"]).astype(x.dtype)
