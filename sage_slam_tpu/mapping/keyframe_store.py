"""Keyframe store — fixed-capacity struct-of-arrays on device.

TPU-native replacement for the reference's pointer-based Frame/Keyframe/
FrameGraph (frame.h:100-124, keyframe_map.h:16-120): every per-keyframe
tensor lives in one stacked, padded device array with a leading keyframe
axis, so the whole window is directly consumable by the batched BA edge
kernels without gather-from-host. Graph topology (links, flags) stays on
host — it is tiny and mutates per keyframe, not per iteration.

A functional update discipline replaces the reference's per-keyframe
shared_mutex: BA returns new Variables which are written back wholesale;
loop closures bump `reinitialize_count` exactly like the reference's
reconciliation protocol (frame.h:124, mapper.cpp:1164).
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Dict, List, Optional, Set

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.se3 import SE3
from ..solver.ba import WindowData
from ..solver.graph import Variables


@jax.jit
def _get_row_jit(arr, i):
    return jax.lax.dynamic_index_in_dim(arr, i, 0, keepdims=False)


@jax.jit
def _set_row_jit(arr, i, val):
    return jax.lax.dynamic_update_index_in_dim(
        arr, val.astype(arr.dtype), i, 0
    )


@jax.jit
def _set_ax1_jit(arr, i, val):
    return jax.lax.dynamic_update_index_in_dim(
        arr, val.astype(arr.dtype), i, 1
    )


@jax.jit
def _set_ax2_jit(arr, i, val):
    return jax.lax.dynamic_update_index_in_dim(
        arr, val.astype(arr.dtype), i, 2
    )


@jax.jit
def _set_cols_jit(arr, col, val):
    """Write a column block val [R, W] into arr [R, K*W] at column `col`."""
    return jax.lax.dynamic_update_slice(
        arr, val.astype(arr.dtype), (jnp.asarray(0, col.dtype), col)
    )


@jax.jit
def _get_ax1_jit(arr, i):
    return jax.lax.dynamic_index_in_dim(arr, i, 1, keepdims=False)


@jax.jit
def _get_ax2_jit(arr, i):
    return jax.lax.dynamic_index_in_dim(arr, i, 2, keepdims=False)


@jax.jit
def _depth_map_jit(bias, jac, code, scale, i):
    from ..ops.depth import decode_depth

    idx = lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)
    return decode_depth(idx(bias), idx(jac), idx(code), idx(scale))


def get_row(arr, i: int):
    """Dynamic row read: ONE compiled program per array shape instead of
    one per (shape, index) — Python-int indexing bakes the index into the
    jaxpr and recompiles for every keyframe id (critical with this
    environment's slow remote compiles)."""
    return _get_row_jit(arr, jnp.asarray(i, jnp.int32))


def set_row(arr, i: int, val):
    return _set_row_jit(arr, jnp.asarray(i, jnp.int32), val)


@dataclasses.dataclass
class FrameData:
    """Per-frame tensors produced by BuildFrame (mapper.cpp:1184-1255)."""

    timestamp: float
    bias_flat: jax.Array  # [HW]
    jac_flat: jax.Array  # [HW, CS]
    feat_pyr: jax.Array  # [C, T]
    grad_pyr: jax.Array  # [2, C, T]
    feat_desc_flat: jax.Array  # [HW, C]
    src_feats: jax.Array  # [L, N, C] per-level sampled source features
    loc1d: jax.Array  # [N] sampled photometric pixels
    homo: jax.Array  # [N, 3]
    avg_sq_bias: float
    pose: SE3
    code: jax.Array  # [CS]
    scale: float
    # static sampling tables (ops/photometric.build_photo_tables on the
    # single frame), computed inside the jitted BuildFrame so mapping
    # steps never rebuild per-window tables (their build over the whole
    # window dominated the mapping tick)
    packed_fg: Optional[jax.Array] = None  # [4*(3C+1), Tq]
    packed_feat: Optional[jax.Array] = None  # [4*(C+1), Tq]
    dense_fg: tuple = ()  # per dense level: [1, 3C, M_l]
    dense_feat: tuple = ()
    bias_at: Optional[jax.Array] = None  # [N]
    jac_at: Optional[jax.Array] = None  # [N, CS]


class KeyframeStore:
    def __init__(
        self,
        capacity: int,
        num_samples: int,
        hw: int,
        cs: int,
        fs: int,
        total_pyr: int,
        levels: int = 4,
        dtype=jnp.float32,
    ):
        self.capacity = capacity
        self.num_active = 0
        k = capacity
        self.variables = Variables(
            pose=SE3.identity((k,), dtype),
            code=jnp.zeros((k, cs), dtype),
            scale=jnp.ones((k,), dtype),
        )
        self.loc1d = jnp.zeros((k, num_samples), jnp.int32)
        self.homo = jnp.zeros((k, num_samples, 3), dtype)
        self.bias_flat = jnp.zeros((k, hw), dtype)
        self.jac_flat = jnp.zeros((k, hw, cs), dtype)
        # pyramids are CHANNEL-major ([C, K, T]) so the flat shared view
        # [C, K*T] used by the factor kernels is a free reshape
        self.feat_pyr = jnp.zeros((fs, k, total_pyr), dtype)
        self.src_feats = jnp.zeros((k, levels, num_samples, fs), dtype)
        self.grad_pyr = jnp.zeros((2, fs, k, total_pyr), dtype)
        self.feat_desc = jnp.zeros((k, hw, fs), dtype)
        self.avg_sq_bias = jnp.zeros((k,), dtype)
        # static sampling tables, lazily allocated from the first added
        # frame's table shapes (see FrameData)
        self.packed_fg: Optional[jax.Array] = None  # [4*(3C+1), K*Tq]
        self.packed_feat: Optional[jax.Array] = None  # [4*(C+1), K*Tqf]
        self.dense_fg: tuple = ()
        self.dense_feat: tuple = ()
        self.bias_at: Optional[jax.Array] = None  # [K, N]
        self.jac_at: Optional[jax.Array] = None  # [K, N, CS]
        # host-side metadata
        self.timestamps: List[float] = []
        self.reinitialize_count = np.zeros(k, np.int32)
        self.links: Dict[int, Set[int]] = {}
        self.global_loop_links: Set[tuple] = set()
        self.local_loop_searched = np.zeros(k, bool)
        self.global_loop_searched = np.zeros(k, bool)
        # aux (non-keyframe) refinement frames: pose-only variables —
        # code and scale stay frozen in BA (gtsam_utils.h:10 AuxPoseKey,
        # df_work.cpp:41 `IsKeyframe() ? PoseKey : AuxPoseKey`)
        self.aux = np.zeros(k, bool)
        # --- concurrency (the per-keyframe shared_mutex + reinitialize
        # protocol of the reference, frame.h:98/:124, re-expressed for
        # functional device arrays):
        # * `lock` guards multi-field mutations and snapshot reads; long
        #   device solves run OUTSIDE it against an immutable snapshot,
        # * `version[i]` bumps whenever row i is (re)written by the
        #   frontend (add) or a loop closure; a backend merging its solve
        #   keeps the store's value for any row whose version moved while
        #   it was solving (the mapper.cpp:1164 "loop closure wins" rule,
        #   generalized to any concurrent writer).
        self.lock = threading.RLock()
        self.version = np.zeros(k, np.int64)

    def add(self, fr: FrameData) -> int:
        """Append a keyframe; returns its id (= row index)."""
        with self.lock:
            return self._add_locked(fr)

    def _add_locked(self, fr: FrameData) -> int:
        i = self.num_active
        if i >= self.capacity:
            raise RuntimeError("keyframe store capacity exceeded")
        self.variables = Variables(
            pose=SE3(
                set_row(self.variables.pose.rot, i, fr.pose.rot),
                set_row(self.variables.pose.trans, i, fr.pose.trans),
            ),
            code=set_row(self.variables.code, i, fr.code),
            scale=set_row(
                self.variables.scale, i, jnp.asarray(fr.scale)
            ),
        )
        self.loc1d = set_row(self.loc1d, i, fr.loc1d)
        self.homo = set_row(self.homo, i, fr.homo)
        self.bias_flat = set_row(self.bias_flat, i, fr.bias_flat)
        self.jac_flat = set_row(self.jac_flat, i, fr.jac_flat)
        self.feat_pyr = _set_ax1_jit(
            self.feat_pyr, jnp.asarray(i, jnp.int32), fr.feat_pyr
        )
        self.src_feats = set_row(self.src_feats, i, fr.src_feats)
        self.grad_pyr = _set_ax2_jit(
            self.grad_pyr, jnp.asarray(i, jnp.int32), fr.grad_pyr
        )
        self.feat_desc = set_row(self.feat_desc, i, fr.feat_desc_flat)
        self.avg_sq_bias = set_row(
            self.avg_sq_bias, i, jnp.asarray(fr.avg_sq_bias)
        )
        if fr.packed_fg is not None:
            k = self.capacity
            if self.packed_fg is None:
                self.packed_fg = jnp.zeros(
                    (fr.packed_fg.shape[0], k * fr.packed_fg.shape[1]),
                    fr.packed_fg.dtype,
                )
                self.packed_feat = jnp.zeros(
                    (fr.packed_feat.shape[0], k * fr.packed_feat.shape[1]),
                    fr.packed_feat.dtype,
                )
                self.dense_fg = tuple(
                    jnp.zeros((k,) + d.shape[1:], d.dtype)
                    for d in fr.dense_fg
                )
                self.dense_feat = tuple(
                    jnp.zeros((k,) + d.shape[1:], d.dtype)
                    for d in fr.dense_feat
                )
                self.bias_at = jnp.zeros(
                    (k,) + fr.bias_at.shape, fr.bias_at.dtype
                )
                self.jac_at = jnp.zeros(
                    (k,) + fr.jac_at.shape, fr.jac_at.dtype
                )
            tq = self.packed_fg.shape[1] // k
            tqf = self.packed_feat.shape[1] // k
            self.packed_fg = _set_cols_jit(
                self.packed_fg, jnp.asarray(i * tq, jnp.int32), fr.packed_fg
            )
            self.packed_feat = _set_cols_jit(
                self.packed_feat,
                jnp.asarray(i * tqf, jnp.int32),
                fr.packed_feat,
            )
            self.dense_fg = tuple(
                set_row(big, i, small[0])
                for big, small in zip(self.dense_fg, fr.dense_fg)
            )
            self.dense_feat = tuple(
                set_row(big, i, small[0])
                for big, small in zip(self.dense_feat, fr.dense_feat)
            )
            self.bias_at = set_row(self.bias_at, i, fr.bias_at)
            self.jac_at = set_row(self.jac_at, i, fr.jac_at)
        self.timestamps.append(fr.timestamp)
        self.links[i] = set()
        self.version[i] += 1
        self.num_active += 1
        return i

    def add_link(self, a: int, b: int, global_loop: bool = False):
        """Undirected link (keyframe_map.h:16-90)."""
        self.links.setdefault(a, set()).add(b)
        self.links.setdefault(b, set()).add(a)
        if global_loop:
            self.global_loop_links.add((min(a, b), max(a, b)))

    def link_exists(self, a: int, b: int) -> bool:
        return b in self.links.get(a, set())

    def connections(self, a: int, temporal_only: bool = False):
        out = sorted(self.links.get(a, set()))
        if temporal_only:
            out = [
                b
                for b in out
                if (min(a, b), max(a, b)) not in self.global_loop_links
            ]
        return out

    def window_data(self, mask_flat: jax.Array) -> WindowData:
        return WindowData(
            loc1d=self.loc1d,
            homo=self.homo,
            bias_flat=self.bias_flat,
            jac_flat=self.jac_flat,
            feat_pyr=self.feat_pyr,
            grad_pyr=self.grad_pyr,
            src_feats=self.src_feats,
            avg_sq_bias=self.avg_sq_bias,
            mask_flat=mask_flat,
            packed_fg=self.packed_fg,
            packed_feat=self.packed_feat,
            bias_at=self.bias_at,
            jac_at=self.jac_at,
            dense_fg=self.dense_fg,
            dense_feat=self.dense_feat,
        )

    def set_variables(self, variables: Variables, skip_reinitialized=True):
        """Write BA estimates back (UpdateMap, mapper.cpp:1141-1180).

        Keyframes with reinitialize_count > 0 keep their loop-closure
        values (mapper.cpp:1164)."""
        if skip_reinitialized and self.reinitialize_count.any():
            self._merge_keep(
                variables, self.reinitialize_count > 0
            )
        else:
            self.variables = variables

    def snapshot(self):
        """Consistent (num_active, version.copy(), variables) triple for
        a backend solve; call under `lock`."""
        return self.num_active, self.version.copy(), self.variables

    def merge_variables(
        self, variables: Variables, snap_version: np.ndarray, snap_n: int
    ):
        """Merge a backend's solved variables against concurrent writes
        (call under `lock`): a row keeps the STORE's current value when
        it was created after the snapshot (the solve never optimized it)
        or its version moved during the solve (a loop closure rewrote it
        — loop wins, mapper.cpp:1164); every other row takes the solve's
        value."""
        keep = self.version != snap_version
        keep[snap_n:] = True
        self._merge_keep(variables, keep)

    def _merge_keep(self, variables: Variables, keep_rows: np.ndarray):
        """Write `variables` into the store except rows where
        keep_rows[i] is True (those keep the store's current value)."""
        if not keep_rows.any():
            self.variables = variables
            return
        keep = jnp.asarray(keep_rows.astype(np.float32))[:, None]
        keep3 = keep[..., None]
        self.variables = Variables(
            pose=SE3(
                jnp.where(
                    keep3, self.variables.pose.rot, variables.pose.rot
                ),
                jnp.where(
                    keep, self.variables.pose.trans, variables.pose.trans
                ),
            ),
            code=jnp.where(keep, self.variables.code, variables.code),
            scale=jnp.where(
                keep[:, 0], self.variables.scale, variables.scale
            ),
        )

    def pose(self, i: int) -> SE3:
        return SE3(
            get_row(self.variables.pose.rot, i),
            get_row(self.variables.pose.trans, i),
        )

    def row(self, name: str, i: int):
        """Dynamic-index read of any stacked per-keyframe array."""
        if name == "feat_pyr":
            return _get_ax1_jit(self.feat_pyr, jnp.asarray(i, jnp.int32))
        if name == "grad_pyr":
            return _get_ax2_jit(self.grad_pyr, jnp.asarray(i, jnp.int32))
        return get_row(getattr(self, name), i)

    def depth_map(self, i: int) -> jax.Array:
        """Decoded scaled depth of keyframe i (mapping_utils.h:216-222)."""
        return _depth_map_jit(
            self.bias_flat,
            self.jac_flat,
            self.variables.code,
            self.variables.scale,
            jnp.asarray(i, jnp.int32),
        )
