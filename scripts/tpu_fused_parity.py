#!/usr/bin/env python
"""Fused-train numerical rigor (VERDICT r4 weak-3/#6): 200-step Adam
trajectory parity ops-vs-fused on the PRODUCTION 10-block plan, f32 and
bf16, plus gradient parity at the evolved endpoint.

The r4 gate was 3 steps on a 3-block toy; a subtle backward-kernel bug that
compounds over tens of steps would have passed it.  This harness runs both
impls 200 Adam steps from identical init on identical data (dropout 0 —
mask layouts differ between impls, so dropout>0 is statistically rather
than bitwise comparable) and records:

* the full 200-step loss curves and their max relative divergence,
* BN running-stat divergence at the endpoint (2000 accumulated updates),
* gradient parity at step 0 AND at the ops-path's step-200 params (the
  compounding check: gradients must still agree after the trajectory).

Writes FUSEDTRAIN_r05.json.  Run alone on the chip; ~2 compiles per
precision (persistent cache makes re-runs cheap).

    python scripts/tpu_fused_parity.py [f32|bf16|both] [impl=fused|hybrid4]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STEPS = 200
BATCH, T = 16, 128


def run_pair(precision: str, impl: str) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from stgcn_tpu.data.synthetic import random_batch
    from stgcn_tpu.graph.adjacency import Strategy
    from stgcn_tpu.models.stgcn import STGCN, STGCNConfig
    from stgcn_tpu.training import metrics as M
    from stgcn_tpu.training.loop import make_train_step
    from stgcn_tpu.training.train_state import create_train_state

    bf16 = precision == "bf16"
    kw: dict = dict(strategy=Strategy.DISTANCE, d=1, residual=True,
                    dropout_rate=0.0, temporal_impl="auto",
                    compute_dtype=jnp.bfloat16 if bf16 else None)
    if impl.startswith("hb:"):
        fused_kw = dict(kw, block_impl="hybrid",
                        fused_blocks=tuple(int(v)
                                           for v in impl[3:].split(",")))
    elif impl.startswith("hybrid"):
        fused_kw = dict(kw, block_impl="hybrid", fused_from=int(impl[6:]))
    else:
        fused_kw = dict(kw, block_impl="fused")

    x, y = random_batch(np.random.default_rng(0), BATCH, T)
    x, y = jnp.asarray(x), jnp.asarray(y)

    results = {}
    end_params = {}
    for name, cfg_kw in (("ops", kw), (impl, fused_kw)):
        model = STGCN(STGCNConfig(**cfg_kw))
        opt = optax.adam(1e-3)
        ts = create_train_state(model, opt, seed=0)
        step = make_train_step(model, opt, donate=False)
        losses = []
        for _ in range(STEPS):
            ts, m = step(ts, x, y)
            losses.append(float(m["loss"]))
        results[name] = {
            "losses": losses,
            "model_state": jax.tree.map(np.asarray, ts.model_state),
        }
        end_params[name] = ts.params
        print(f"# {precision} {name}: loss[0]={losses[0]:.4f} "
              f"loss[-1]={losses[-1]:.4f}", flush=True)

    lo = np.asarray(results["ops"]["losses"])
    lf = np.asarray(results[impl]["losses"])
    loss_rel = np.abs(lf - lo) / np.maximum(np.abs(lo), 1e-3)
    loss_abs = np.abs(lf - lo)

    # BN running stats after 200 steps x 10 blocks x 2 BNs, normalized by
    # each leaf's own magnitude: deep-layer activation variances reach 1e4+
    # once the loss is at plateau, and the two trajectories' params differ
    # by default-precision noise, so only a leafmax-relative metric is
    # interpretable.  The worst leaves are named for inspection.
    bn_rows = []
    for bi, (b_ops, b_f) in enumerate(zip(
            results["ops"]["model_state"]["blocks"],
            results[impl]["model_state"]["blocks"])):
        for k in ("bn1", "bn2"):
            for stat in ("mean", "var"):
                a, g = b_ops[k][stat], b_f[k][stat]
                leafmax = float(np.abs(a).max())
                diff = float(np.abs(g - a).max())
                bn_rows.append((diff / max(leafmax, 1e-3),
                                f"block{bi}.{k}.{stat}", leafmax, diff))
    bn_rows.sort(reverse=True)
    bn_rel = [r[0] for r in bn_rows]
    bn_abs = [r[3] for r in bn_rows]

    # gradient parity at step 0 and at the ops-path endpoint.  Both the
    # production DEFAULT matmul precision (bf16-passes on TPU even for f32
    # inputs — op-order differences between impls accumulate through 10 BN
    # layers) and HIGHEST (the algorithmic-parity number; interpret-mode
    # CPU tests pin the same property at 1e-4).
    def grads_at(params, cfg_kw, prec):
        model = STGCN(STGCNConfig(**cfg_kw))
        _, state0 = model.init(jax.random.key(0))

        def loss_fn(p):
            logits, _ = model.apply(p, state0, x, train=True,
                                    precision=prec)
            return M.cross_entropy(logits, y)

        return jax.jit(jax.grad(loss_fn))(params)

    grad_rows = {}
    model0 = STGCN(STGCNConfig(**kw))
    params0, _ = model0.init(jax.random.key(0))
    precs = [("default", None)]
    if precision == "f32":
        precs.append(("highest", jax.lax.Precision.HIGHEST))
    for prec_name, prec in precs:
        for tag, p in (("init", params0), ("after200", end_params["ops"])):
            g_ops = grads_at(p, kw, prec)
            g_f = grads_at(p, fused_kw, prec)
            rels = []
            for a, g in zip(jax.tree.leaves(g_ops), jax.tree.leaves(g_f)):
                a, g = np.asarray(a, np.float64), np.asarray(g, np.float64)
                denom = max(float(np.abs(a).max()), 1e-6)
                rels.append(float(np.abs(g - a).max() / denom))
            grad_rows[f"{tag}_{prec_name}"] = {
                "max_rel_vs_leafmax": max(rels),
                "median_rel": float(np.median(rels))}
            print(f"# {precision} grad parity {tag} prec={prec_name}: "
                  f"max_rel={max(rels):.2e} med={np.median(rels):.2e}",
                  flush=True)

    return {
        "steps": STEPS, "batch": BATCH, "t": T, "impl_vs": impl,
        "loss_final_ops": float(lo[-1]), "loss_final_fused": float(lf[-1]),
        "loss_max_rel_divergence": float(loss_rel.max()),
        "loss_max_abs_divergence": float(loss_abs.max()),
        "loss_rel_at_step": {str(i): float(loss_rel[i])
                             for i in (0, 9, 49, 99, 199)},
        "loss_abs_at_step": {str(i): float(loss_abs[i])
                             for i in (0, 9, 49, 99, 199)},
        "bn_running_stats_max_rel_vs_leafmax": max(bn_rel),
        "bn_running_stats_median_rel_vs_leafmax": float(
            np.median(bn_rel)),
        "bn_running_stats_worst3": [
            {"leaf": r[1], "rel_vs_leafmax": round(r[0], 5),
             "leaf_max": round(r[2], 2), "max_abs_diff": round(r[3], 4)}
            for r in bn_rows[:3]],
        "grad_parity": grad_rows,
    }


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    impl = sys.argv[2] if len(sys.argv) > 2 else "fused"
    from stgcn_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    out = {"backend": jax.default_backend(), "impl": impl}
    for prec in (("f32", "bf16") if which == "both" else (which,)):
        out[prec] = run_pair(prec, impl)
    path = os.path.join(REPO, "FUSEDTRAIN_r05.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "backend"},
                     default=str)[:2000], flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
