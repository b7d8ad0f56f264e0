"""Trained-Gaussian PLY export/import in the standard 3DGS attribute layout.

Viewer-compatible analog of the reference's ``GaussianModel.save_ply`` /
``load_ply`` (gaussian_model.py:82-157) and the composite
``StreetGaussianModel.save_ply`` which writes one element per sub-model
named ``vertex_<model_name>`` (street_gaussian_model.py:88-99).

Attribute order matches ``construct_list_of_attributes``: x y z nx ny nz,
f_dc_* (channel-major: [N, F, 3] -> [N, 3, F] -> flat), f_rest_* (same),
opacity, scale_0..2, rot_0..3. All float32, binary little-endian. A single
pool exports as element ``vertex`` so external 3DGS viewers load it
directly.
"""

from __future__ import annotations

import os

import numpy as np

from ..models.gs.params import GaussianPool


def pool_to_attributes(pool: GaussianPool, semantic: np.ndarray | None = None
                       ) -> tuple[list[str], np.ndarray]:
    """Valid rows of a pool -> (attribute names, [n, D] float32 matrix).

    ``semantic``: optional [cap, num_classes] logits appended as trailing
    ``semantic_i`` properties (gaussian_model.py:90-95)."""
    valid = np.asarray(pool.valid)
    xyz = np.asarray(pool.xyz)[valid]
    n = xyz.shape[0]
    f_dc = np.asarray(pool.features_dc)[valid]       # [n, F, 3]
    f_rest = np.asarray(pool.features_rest)[valid]   # [n, K, 3]
    # torch layout: transpose(1, 2).flatten -> channel-major
    f_dc = np.transpose(f_dc, (0, 2, 1)).reshape(n, -1)
    f_rest = np.transpose(f_rest, (0, 2, 1)).reshape(n, -1)
    opacity = np.asarray(pool.opacity)[valid].reshape(n, 1)
    scale = np.asarray(pool.scaling)[valid]
    rot = np.asarray(pool.rotation)[valid]

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(f_dc.shape[1])]
             + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
             + ["opacity"]
             + [f"scale_{i}" for i in range(scale.shape[1])]
             + [f"rot_{i}" for i in range(rot.shape[1])])
    parts = [xyz, np.zeros_like(xyz), f_dc, f_rest, opacity, scale, rot]
    if semantic is not None:
        sem = np.asarray(semantic)[valid].reshape(n, -1)
        names += [f"semantic_{i}" for i in range(sem.shape[1])]
        parts.append(sem)
    mat = np.concatenate(parts, axis=1).astype(np.float32)
    return names, mat


def export_gaussians_ply(path: str | os.PathLike,
                         pools: dict[str, GaussianPool] | GaussianPool,
                         semantics: dict[str, np.ndarray] | np.ndarray | None
                         = None) -> None:
    """Write one binary PLY. A bare pool -> single ``vertex`` element; a
    dict -> one ``vertex_<name>`` element per pool (reference composite).
    ``semantics`` mirrors ``pools``' shape: per-pool [cap, K] logits."""
    if isinstance(pools, GaussianPool):
        elements = [("vertex", *pool_to_attributes(pools, semantics))]
    else:
        semantics = semantics or {}
        elements = [(f"vertex_{name}",
                     *pool_to_attributes(p, semantics.get(name)))
                    for name, p in pools.items()]
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = ["ply", "format binary_little_endian 1.0"]
    for el_name, names, mat in elements:
        header.append(f"element {el_name} {mat.shape[0]}")
        header += [f"property float {a}" for a in names]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        for _, _, mat in elements:
            f.write(np.ascontiguousarray(mat, dtype="<f4").tobytes())


def _parse_elements(path) -> list[tuple[str, dict[str, np.ndarray]]]:
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = f.readline().strip()
        if b"binary_little_endian" not in fmt:
            raise ValueError(f"{path}: expected binary_little_endian")
        elements: list[tuple[str, int, list[str]]] = []
        while True:
            line = f.readline().strip().decode("ascii")
            if line == "end_header":
                break
            parts = line.split()
            if parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] != "float":
                    raise ValueError(f"{path}: only float properties "
                                     f"supported, got {line}")
                elements[-1][2].append(parts[2])
        out = []
        for el_name, count, props in elements:
            raw = np.frombuffer(f.read(4 * count * len(props)), dtype="<f4")
            mat = raw.reshape(count, len(props))
            out.append((el_name, {p: mat[:, i] for i, p in enumerate(props)}))
    return out


def _sorted_cols(cols: dict[str, np.ndarray], prefix: str) -> np.ndarray:
    names = sorted((k for k in cols if k.startswith(prefix)),
                   key=lambda s: int(s.rsplit("_", 1)[1]))
    return np.stack([cols[k] for k in names], axis=1)


def _attributes_to_pool(cols: dict[str, np.ndarray],
                        capacity: int | None) -> GaussianPool:
    import jax.numpy as jnp

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    n = xyz.shape[0]
    f_dc = _sorted_cols(cols, "f_dc_")      # [n, 3*F] channel-major
    f_rest = _sorted_cols(cols, "f_rest_")  # [n, 3*K]
    f_dc = np.transpose(f_dc.reshape(n, 3, -1), (0, 2, 1))
    f_rest = np.transpose(f_rest.reshape(n, 3, -1), (0, 2, 1))
    scale = _sorted_cols(cols, "scale_")
    rot = _sorted_cols(cols, "rot_")
    opacity = cols["opacity"].reshape(n, 1)

    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < {n} gaussians in file")

    def pad(a):
        return jnp.asarray(np.concatenate(
            [a, np.zeros((cap - n,) + a.shape[1:], a.dtype)]))

    return GaussianPool(
        xyz=pad(xyz.astype(np.float32)),
        features_dc=pad(f_dc.astype(np.float32)),
        features_rest=pad(f_rest.astype(np.float32)),
        scaling=pad(scale.astype(np.float32)),
        rotation=pad(rot.astype(np.float32)),
        opacity=pad(opacity.astype(np.float32)),
        valid=jnp.asarray(np.arange(cap) < n))


def import_gaussians_ply(path: str | os.PathLike,
                         capacity: int | None = None,
                         with_semantics: bool = False):
    """Read a 3DGS PLY back into pools. Returns {model_name: pool}; a plain
    single-element ``vertex`` file maps to {"vertex": pool}. With
    ``with_semantics=True`` also returns {model_name: [cap, K] logits or
    None} parsed from trailing ``semantic_i`` properties
    (gaussian_model.py:143-155)."""
    out = {}
    sems = {}
    for el_name, cols in _parse_elements(path):
        name = el_name[len("vertex_"):] if el_name.startswith("vertex_") \
            else el_name
        pool = _attributes_to_pool(cols, capacity)
        out[name] = pool
        if any(k.startswith("semantic_") for k in cols):
            sem = _sorted_cols(cols, "semantic_").astype(np.float32)
            pad = pool.capacity - sem.shape[0]
            sems[name] = np.concatenate(
                [sem, np.zeros((pad, sem.shape[1]), np.float32)])
        else:
            sems[name] = None
    if with_semantics:
        return out, sems
    return out
