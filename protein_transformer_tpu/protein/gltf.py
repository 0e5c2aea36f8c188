"""Pure-Python glTF binary (.glb) export of all-atom structures.

The reference renders 3-D artifacts by driving PyMOL to export gltf/PSE/PNG
(reference: PDB_Creator.py:174-212, log.py:310-356) and logs them to wandb as
``Object3D``. PyMOL is a heavyweight binary dependency; this module writes a
valid glTF 2.0 binary directly from (L, 14, 3) coordinates with real bond
topology derived from the ff14SB build tables (each sidechain atom bonds to
the frame atom it was extended from), restoring ``wandb.Object3D`` parity
with zero dependencies.

The mesh is a LINES primitive (mode 1): one vertex per existing atom, one
line segment per covalent bond (backbone N-CA-C(-O) chains, peptide C-N
links, and sidechain chains), with per-vertex colors distinguishing backbone
(steel blue) from sidechain (amber) atoms.
"""
from __future__ import annotations

import json
import struct

import numpy as np

from protein_transformer_tpu.protein import _ff14sb as ff
from protein_transformer_tpu.protein.constants import NUM_PREDICTED_COORDS

_BB_COLOR = (0.27, 0.51, 0.71, 1.0)   # backbone: steel blue
_SC_COLOR = (1.00, 0.75, 0.15, 1.0)   # sidechain: amber

_MAGIC = 0x46546C67  # "glTF"
_CHUNK_JSON = 0x4E4F534A
_CHUNK_BIN = 0x004E4942


def structure_bonds(seq_ids: np.ndarray) -> np.ndarray:
    """Covalent bonds of a protein as (n_bonds, 2) indices into the flat
    (L*14) atom-slot layout. Missing/padded atoms are NOT filtered here --
    callers intersect with their atom mask.

    Fully vectorized (the structure logger calls this per logged artifact on
    the trainer's 1-CPU host; a Python per-atom loop stole GIL time from the
    train loop) and memoized per sequence (validation logging re-exports the
    same protein every cadence step).
    """
    # normalized dtype so the byte-string cache key is unambiguous (int32
    # and int64 arrays with identical bytes must not collide)
    seq_ids = np.ascontiguousarray(seq_ids, np.int64)
    key = seq_ids.tobytes()
    hit = _BONDS_CACHE.get(key)
    if hit is not None:
        return hit
    length = len(seq_ids)
    aa = np.clip(seq_ids, 0, ff.SC_NUM_ATOMS.shape[0] - 1)
    n_sc = np.asarray(ff.SC_NUM_ATOMS)[aa]              # (L,)
    frame = np.asarray(ff.SC_FRAME_IDX)[aa]             # (L, 10, 3)

    base = np.arange(length, dtype=np.int64) * NUM_PREDICTED_COORDS  # (L,)
    bb = np.stack([np.stack([base + 0, base + 1], -1),   # N-CA
                   np.stack([base + 1, base + 2], -1),   # CA-C
                   np.stack([base + 2, base + 3], -1)],  # C=O
                  axis=1).reshape(-1, 2)
    peptide = np.stack([base[:-1] + 2,
                        base[1:] + 0], -1)               # C-N links
    # each sidechain atom extends from its frame's third atom c
    # (geometry.build_sidechains); buffer idx 0-3 = backbone, 4-13 =
    # sidechain slots, 14 = anchor (previous C / next N -- skip: that bond
    # is already the peptide link above).
    c = frame[:, :, 2].astype(np.int64)                  # (L, 10)
    slots = np.arange(10)
    live = (slots[None, :] < n_sc[:, None]) & (c != ff.ANCHOR_IDX)
    src = (base[:, None] + c)[live]
    dst = (base[:, None] + 4 + slots[None, :])[live]
    sc = np.stack([src, dst], -1)
    out = np.concatenate([bb, peptide.reshape(-1, 2), sc]).reshape(-1, 2)
    if len(_BONDS_CACHE) > 64:
        _BONDS_CACHE.clear()
    _BONDS_CACHE[key] = out
    return out


_BONDS_CACHE: dict = {}


def _structure_arrays(coords: np.ndarray, seq_ids: np.ndarray,
                      atom_mask: np.ndarray | None = None,
                      color: tuple | None = None):
    """One structure's (positions, colors, line indices) for a LINES mesh.

    color: optional fixed RGBA overriding the backbone/sidechain palette
    (used to distinguish the true structure in a combined scene)."""
    coords = np.asarray(coords, np.float32).reshape(-1, 3)
    length = len(seq_ids)
    n = length * NUM_PREDICTED_COORDS
    if atom_mask is None:
        atom_mask = np.isfinite(coords).all(-1) & (np.abs(coords).sum(-1) > 0)
    else:
        atom_mask = np.asarray(atom_mask).reshape(-1).astype(bool)

    # compact vertices to existing atoms
    new_index = np.full(n, -1, np.int64)
    new_index[atom_mask] = np.arange(atom_mask.sum())
    positions = np.nan_to_num(coords[atom_mask]).astype("<f4")

    bonds = structure_bonds(seq_ids)
    keep = atom_mask[bonds[:, 0]] & atom_mask[bonds[:, 1]]
    indices = new_index[bonds[keep]].astype("<u4").reshape(-1)

    if color is not None:
        colors = np.broadcast_to(np.asarray(color, np.float32),
                                 (len(positions), 4)).astype("<f4")
    else:
        slot = np.tile(np.arange(NUM_PREDICTED_COORDS), length)[atom_mask]
        colors = np.where((slot < 4)[:, None],
                          np.array(_BB_COLOR, np.float32),
                          np.array(_SC_COLOR, np.float32)).astype("<f4")
    return positions, colors, indices


def scene_to_glb(structures) -> bytes:
    """Multiple structures -> ONE glTF 2.0 binary scene.

    structures: iterable of (coords, seq_ids, atom_mask|None, color|None)
    tuples; all merge into a single LINES primitive with per-vertex colors.
    Capability parity with the reference's aligned true+pred single-scene
    gltf export (PDB_Creator.py:186-212), minus PyMOL.
    """
    parts = [_structure_arrays(c, s, m, col) for c, s, m, col in structures]
    offset = 0
    pos_l, col_l, idx_l = [], [], []
    for positions, colors, indices in parts:
        pos_l.append(positions)
        col_l.append(colors)
        idx_l.append(indices + np.uint32(offset))
        offset += len(positions)
    positions = np.concatenate(pos_l) if pos_l else np.zeros((0, 3), "<f4")
    colors = np.concatenate(col_l) if col_l else np.zeros((0, 4), "<f4")
    indices = (np.concatenate(idx_l) if idx_l
               else np.zeros((0,), "<u4")).astype("<u4")
    return _pack_glb(positions, colors, indices)


def coords_to_glb(coords: np.ndarray, seq_ids: np.ndarray,
                  atom_mask: np.ndarray | None = None) -> bytes:
    """(L, 14, 3) coordinates -> glTF 2.0 binary blob.

    atom_mask: optional (L, 14) bool; absent atoms (and their bonds) are
    dropped. Vertices carry COLOR_0 (backbone vs sidechain).
    """
    positions, colors, indices = _structure_arrays(coords, seq_ids,
                                                   atom_mask)
    return _pack_glb(positions, colors, indices)


def _pack_glb(positions: np.ndarray, colors: np.ndarray,
              indices: np.ndarray) -> bytes:
    pos_bytes = positions.tobytes()
    col_bytes = colors.tobytes()
    idx_bytes = indices.tobytes()

    def _pad4(b: bytes, fill: bytes = b"\x00") -> bytes:
        return b + fill * (-len(b) % 4)

    pos_off = 0
    col_off = pos_off + len(_pad4(pos_bytes))
    idx_off = col_off + len(_pad4(col_bytes))
    bin_blob = _pad4(pos_bytes) + _pad4(col_bytes) + _pad4(idx_bytes)

    gltf = {
        "asset": {"version": "2.0",
                  "generator": "protein-transformer-tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "COLOR_0": 1},
            "indices": 2,
            "mode": 1,  # LINES
        }]}],
        "buffers": [{"byteLength": len(bin_blob)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": pos_off,
             "byteLength": len(pos_bytes), "target": 34962},
            {"buffer": 0, "byteOffset": col_off,
             "byteLength": len(col_bytes), "target": 34962},
            {"buffer": 0, "byteOffset": idx_off,
             "byteLength": len(idx_bytes), "target": 34963},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": len(positions),
             "type": "VEC3",
             "min": [float(v) for v in positions.min(0)] if len(positions)
             else [0, 0, 0],
             "max": [float(v) for v in positions.max(0)] if len(positions)
             else [0, 0, 0]},
            {"bufferView": 1, "componentType": 5126, "count": len(colors),
             "type": "VEC4"},
            {"bufferView": 2, "componentType": 5125, "count": len(indices),
             "type": "SCALAR"},
        ],
    }
    json_blob = _pad4(json.dumps(gltf, separators=(",", ":")).encode(), b" ")

    total = 12 + 8 + len(json_blob) + 8 + len(bin_blob)
    out = struct.pack("<III", _MAGIC, 2, total)
    out += struct.pack("<II", len(json_blob), _CHUNK_JSON) + json_blob
    out += struct.pack("<II", len(bin_blob), _CHUNK_BIN) + bin_blob
    return out


def save_glb(path: str, coords: np.ndarray, seq_ids: np.ndarray,
             atom_mask: np.ndarray | None = None) -> None:
    with open(path, "wb") as f:
        f.write(coords_to_glb(coords, seq_ids, atom_mask))


def save_glb_scene(path: str, structures) -> None:
    """Write multiple structures into one .glb scene (see scene_to_glb)."""
    with open(path, "wb") as f:
        f.write(scene_to_glb(structures))
