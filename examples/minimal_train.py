"""Minimal raw training loop — no Trainer, no CLI.

The spiritual counterpart of the reference's deprecated hand-written loop
(src/scripts/KTH_train_model.py:13-61), showing the framework's functional
core directly: build a model, make a fused jitted step, iterate.  Unlike the
reference's version this one has none of the quirks (no double softmax, no
early-breaks, no retain_graph) — it is the minimal correct loop.

Run: python examples/minimal_train.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from stgcn_tpu.data.synthetic import random_batch
from stgcn_tpu.graph.adjacency import Strategy
from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
from stgcn_tpu.training.loop import make_train_step
from stgcn_tpu.training.train_state import create_train_state


def main():
    model = STGCN(STGCNConfig(strategy=Strategy.DISTANCE, d=1,
                              plan=((16, 1), (32, 2)), residual=True))
    optimizer = optax.adam(1e-2)
    state = create_train_state(model, optimizer, seed=0)
    step = make_train_step(model, optimizer)

    x, y = random_batch(np.random.default_rng(0), batch=32, t=64)
    x, y = jnp.asarray(x), jnp.asarray(y)

    for epoch in range(20):
        state, metrics = step(state, x, y)
        print(f"epoch {epoch:2d}  loss {float(metrics['loss']):.4f}  "
              f"acc {float(metrics['acc']):.3f}")


if __name__ == "__main__":
    main()
