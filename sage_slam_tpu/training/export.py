"""Export trained networks for the SLAM runtime.

The reference exports TorchScript modules for the C++ runtime
(representation/training.py:189-197 export mode, configs/export.json);
here the runtime consumes the SAME parameter layout the nets train in,
so export = splitting the training checkpoint into per-net npz files
whose dotted-path keys `models.partial_unet.load_torch_state_dict`
(and the demo CLIs' --depth_checkpoint/--feat_checkpoint flags) load
directly.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np


def flatten_params(tree, prefix: str = "") -> dict:
    """Flatten a params pytree into {dotted.path: np.ndarray} with the
    naming convention load_torch_state_dict walks (dict keys and list
    indices joined by '.')."""
    out = {}

    def visit(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{path}.{k}" if path else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(v, f"{path}.{i}" if path else str(i))
        else:
            out[path] = np.asarray(node)

    visit(tree, prefix)
    return out


def export_networks(state, out_prefix: str) -> dict:
    """Split a TrainState into per-net runtime npz checkpoints:

    - ``{out_prefix}_depth.npz`` / ``_feat.npz`` / ``_disc.npz`` —
      dotted-path key files for the demo CLI loaders,
    - ``{out_prefix}_ba.npz`` — the learned BA weights (per-level
      photometric weights/power, damping, sigma) for the runtime's
      factor configuration (the reference's ba_model.pt role).

    Returns {name: path}.
    """
    paths = {}
    for name in ("depth", "feat", "disc"):
        path = f"{out_prefix}_{name}.npz"
        np.savez(path, **flatten_params(state.params[name]))
        paths[name] = path

    ba = state.params["ba"]
    ba_flat = {
        f.name: np.asarray(getattr(ba, f.name))
        for f in dataclasses.fields(ba)
    } if dataclasses.is_dataclass(ba) else {
        k: np.asarray(v) for k, v in zip(ba._fields, ba)
    }
    ba_flat["log_sigma"] = np.asarray(state.params["log_sigma"])
    path = f"{out_prefix}_ba.npz"
    np.savez(path, **ba_flat)
    paths["ba"] = path
    return paths


def load_ba_params(path: str, template):
    """Rebuild BA weight params from an exported _ba.npz (inverse of
    export_networks). `template` provides the container type."""
    d = dict(np.load(path))
    d.pop("log_sigma", None)
    if dataclasses.is_dataclass(template):
        names = [f.name for f in dataclasses.fields(template)]
        return type(template)(**{
            n: jax.numpy.asarray(d[n]) for n in names
        })
    return type(template)(*[jax.numpy.asarray(d[n]) for n in template._fields])
