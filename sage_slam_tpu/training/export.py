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


def export_networks(
    state, out_prefix: str, depth_cfg=None, feat_cfg=None
) -> dict:
    """Split a TrainState into per-net runtime npz checkpoints:

    - ``{out_prefix}_depth.npz`` / ``_feat.npz`` / ``_disc.npz`` —
      dotted-path key files for the demo CLI loaders,
    - ``{out_prefix}_ba.npz`` — the learned BA weights (per-level
      photometric weights/power, damping, sigma) for the runtime's
      factor configuration (the reference's ba_model.pt role),
    - ``{out_prefix}_netcfg.json`` — the network architecture configs
      (when ``depth_cfg``/``feat_cfg`` are given) so the demo CLI can
      rebuild matching parameter trees (``--net_config`` flag); the
      TorchScript export carries its architecture implicitly
      (representation/training.py:189-197), the npz export carries it
      in this sidecar.

    Returns {name: path}.
    """
    paths = {}
    if depth_cfg is not None or feat_cfg is not None:
        import json

        cfgs = {}
        if depth_cfg is not None:
            cfgs["depth"] = depth_cfg._asdict()
        if feat_cfg is not None:
            cfgs["feat"] = feat_cfg._asdict()
        path = f"{out_prefix}_netcfg.json"
        with open(path, "w") as f:
            json.dump(cfgs, f, indent=2)
        paths["netcfg"] = path
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


def load_net_configs(path: str):
    """Rebuild (DepthNetConfig, FeatureNetConfig) from a _netcfg.json
    sidecar (either may be None if absent). JSON lists are converted
    back to the tuples the NamedTuple configs use (they key jit
    caches, so they must be hashable)."""
    import json

    from ..models.depth_network import DepthNetConfig
    from ..models.feature_network import FeatureNetConfig

    def detuple(v):
        if isinstance(v, list):
            return tuple(detuple(x) for x in v)
        return v

    with open(path) as f:
        raw = json.load(f)
    depth_cfg = (
        DepthNetConfig(**{k: detuple(v) for k, v in raw["depth"].items()})
        if "depth" in raw
        else None
    )
    feat_cfg = (
        FeatureNetConfig(**{k: detuple(v) for k, v in raw["feat"].items()})
        if "feat" in raw
        else None
    )
    return depth_cfg, feat_cfg


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
