"""PyTorch state_dict importer.

Maps the reference's parameter naming (src/network/stgcn.py &
src/lightning_model.py modules: ``conv.{i}.spatialConv.W.{weight,bias}``,
``conv.{i}.temporalConv.*``, ``conv.{i}.batch_n{,_2}.*``,
``conv.{i}.spatialConv.A``, ``conv.{i}.apply_residual.*``, ``fc_layer.*``,
``Masks.{i}``) onto our ``(params, state)`` pytrees, transposing layouts from
NCHW conv weights to our channel-last shapes.

Used for (a) restoring reference-trained checkpoints (BASELINE.json config 3)
and (b) the per-layer parity test harness.  Accepts any mapping of name ->
numpy array, so tests can pass ``{k: v.numpy() for k, v in
module.state_dict().items()}`` without this module importing torch.
"""

from __future__ import annotations

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def import_state_dict(
    state_dict: dict,
    num_blocks: int,
    num_partitions: int,
    *,
    residual: bool = False,
) -> tuple[dict, dict]:
    """Convert a reference state_dict into ``(params, state)`` pytrees.

    The spatial 1x1 conv weight ``(K*C_out, C_in, 1, 1)`` becomes our
    ``(C_in, K, C_out)`` (the reference views its output as ``(N, K, C_out, T,
    V)``, so output channel ``k*C_out + o`` maps to ``(k, o)``); the temporal
    conv ``(C_out, C_in, gamma, 1)`` becomes HWIO ``(gamma, 1, C_in, C_out)``.

    The per-layer ``spatialConv.A`` tensors are imported as trainable ``A``
    params (adjacency_mode="reference" semantics — that is what reference
    checkpoints contain, see SURVEY.md Q2).  The dead ``Masks.{i}`` entries
    are ignored.
    """
    sd = {k: _np(v) for k, v in state_dict.items()}
    blocks_p, blocks_s = [], []
    for i in range(num_blocks):
        pre = f"conv.{i}."
        w = sd[pre + "spatialConv.W.weight"]  # (K*C_out, C_in, 1, 1)
        kco, c_in = w.shape[0], w.shape[1]
        c_out = kco // num_partitions
        w = w.reshape(num_partitions, c_out, c_in)  # (K, C_out, C_in)
        spatial = {
            "w": np.transpose(w, (2, 0, 1)).copy(),  # (C_in, K, C_out)
            "b": sd[pre + "spatialConv.W.bias"].reshape(num_partitions, c_out).copy(),
        }
        tw = sd[pre + "temporalConv.weight"]  # (C_out, C_in, gamma, 1)
        temporal = {
            "w": np.transpose(tw, (2, 3, 1, 0)).copy(),  # (gamma, 1, C_in, C_out)
            "b": sd[pre + "temporalConv.bias"].copy(),
        }
        p = {
            "spatial": spatial,
            "temporal": temporal,
            "bn1": {
                "scale": sd[pre + "batch_n.weight"].copy(),
                "offset": sd[pre + "batch_n.bias"].copy(),
            },
            "bn2": {
                "scale": sd[pre + "batch_n_2.weight"].copy(),
                "offset": sd[pre + "batch_n_2.bias"].copy(),
            },
        }
        if (pre + "spatialConv.A") in sd:
            p["A"] = sd[pre + "spatialConv.A"].copy()
        if residual and (pre + "apply_residual.weight") in sd:
            rw = sd[pre + "apply_residual.weight"]  # (C_out, C_in, 1, 1)
            p["residual_proj"] = {
                "w": rw[:, :, 0, 0].T.copy(),  # (C_in, C_out)
                "b": sd[pre + "apply_residual.bias"].copy(),
            }
        s = {
            "bn1": {
                "mean": sd[pre + "batch_n.running_mean"].copy(),
                "var": sd[pre + "batch_n.running_var"].copy(),
            },
            "bn2": {
                "mean": sd[pre + "batch_n_2.running_mean"].copy(),
                "var": sd[pre + "batch_n_2.running_var"].copy(),
            },
        }
        blocks_p.append(p)
        blocks_s.append(s)

    params = {
        "blocks": blocks_p,
        "fc": {
            "w": sd["fc_layer.weight"].T.copy(),  # torch Linear is (out, in)
            "b": sd["fc_layer.bias"].copy(),
        },
    }
    return params, {"blocks": blocks_s}


def export_state_dict(params: dict, state: dict, *, residual: bool = False,
                      adjacency: np.ndarray | None = None) -> dict:
    """Inverse mapping: our pytrees -> reference-named numpy state_dict.

    ``adjacency``: the model's constant normalized adjacency, used to emit
    the per-layer ``spatialConv.A`` tensors the reference format requires
    when our params hold a mask (``A ⊙ M_l``) or no graph weights at all
    (fixed mode).  Dead ``Masks.{i}`` entries are emitted as ones for full
    reference-format compatibility.
    """
    out: dict[str, np.ndarray] = {}
    blocks_p = params["blocks"]
    blocks_s = state["blocks"]
    for i, (p, s) in enumerate(zip(blocks_p, blocks_s)):
        pre = f"conv.{i}."
        c_in, K, c_out = p["spatial"]["w"].shape
        out[pre + "spatialConv.W.weight"] = (
            np.transpose(_np(p["spatial"]["w"]), (1, 2, 0))
            .reshape(K * c_out, c_in, 1, 1)
        )
        out[pre + "spatialConv.W.bias"] = _np(p["spatial"]["b"]).reshape(-1)
        out[pre + "temporalConv.weight"] = np.transpose(
            _np(p["temporal"]["w"]), (3, 2, 0, 1))
        out[pre + "temporalConv.bias"] = _np(p["temporal"]["b"])
        out[pre + "batch_n.weight"] = _np(p["bn1"]["scale"])
        out[pre + "batch_n.bias"] = _np(p["bn1"]["offset"])
        out[pre + "batch_n.running_mean"] = _np(s["bn1"]["mean"])
        out[pre + "batch_n.running_var"] = _np(s["bn1"]["var"])
        out[pre + "batch_n_2.weight"] = _np(p["bn2"]["scale"])
        out[pre + "batch_n_2.bias"] = _np(p["bn2"]["offset"])
        out[pre + "batch_n_2.running_mean"] = _np(s["bn2"]["mean"])
        out[pre + "batch_n_2.running_var"] = _np(s["bn2"]["var"])
        if "A" in p:
            a_eff = _np(p["A"])
        elif adjacency is not None and "mask" in p:
            a_eff = np.asarray(adjacency) * _np(p["mask"])
        elif adjacency is not None:
            a_eff = np.asarray(adjacency)
        else:
            a_eff = None
        if a_eff is not None:
            out[pre + "spatialConv.A"] = a_eff
            out[f"Masks.{i}"] = np.ones_like(a_eff)
        if residual and "residual_proj" in p:
            out[pre + "apply_residual.weight"] = (
                _np(p["residual_proj"]["w"]).T[:, :, None, None])
            out[pre + "apply_residual.bias"] = _np(p["residual_proj"]["b"])
    out["fc_layer.weight"] = _np(params["fc"]["w"]).T
    out["fc_layer.bias"] = _np(params["fc"]["b"])
    return out
