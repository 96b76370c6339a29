"""
Batched triangle meshes as immutable array containers.

The scene representation mirrors the reference's mesh hierarchy
(`torchdrivesim/mesh.py:58-759`: BaseMesh -> AttributeMesh -> RGBMesh,
plus the category-annotated BirdviewMesh) and its on-disk JSON format
(`mesh.py:259-297`, format documented in SURVEY.md §2.4), but every
operation returns a new mesh — there is no in-place mutation, so meshes can
be captured as constants or passed as PyTree leaves into jitted functions.

Shape-changing operations (``trim``, ``collate``, ``separate_by_category``)
run on the host with numpy: they are scenario-construction utilities, not
per-step ops, and their output shapes are data-dependent.
"""
from __future__ import annotations

import copy
import dataclasses
import json
import math
import os
import pickle as _pickle
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

from torchdrivesim_tpu.utils import is_inside_polygon, merge_dicts, rotate

Color = Union[jnp.ndarray, np.ndarray, Tuple[int, int, int], List[int]]


def tensor_color(color: Color, dtype=None):
    """
    Normalize color representations to a float (3,) array in [0,1]
    (semantics of `mesh.py:32-47`): int tuples are treated as 0-255 RGB,
    arrays are assumed already in [0,1]. Host inputs (tuples, lists, numpy)
    yield HOST numpy arrays so color tables built at scenario-construction
    time embed as host jit constants (see ``_host``); jax arrays stay jax.
    """
    if isinstance(color, jnp.ndarray) and not isinstance(color, np.ndarray):
        return jnp.asarray(color, dtype=dtype or jnp.float32)
    if isinstance(color, np.ndarray):
        return np.asarray(color, dtype=dtype or np.float32)
    return np.asarray(color, dtype=dtype or np.float32) / 255.0


class BadMeshFormat(RuntimeError):
    """Mesh data on disk had the wrong format (ref: `mesh.py:50`)."""


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _host(*xs) -> bool:
    """
    True if every array is host-resident (numpy). Meshes loaded from disk
    keep numpy leaves until they cross a jit boundary: a device->host fetch
    (``np.asarray`` on a device array) permanently degrades subsequent
    dispatch latency on tunneled TPU backends, so setup-time mesh surgery
    (collate/trim/separate) must never round-trip through the device.
    """
    return all(isinstance(x, np.ndarray) for x in xs)


def _extend_batch(x, n: int):
    """Repeat each batch element n times contiguously (a,b -> a,a,b,b)."""
    return (np if _host(x) else jnp).repeat(x, n, axis=0)


def _pad_stack(arrays: List[np.ndarray], fill) -> np.ndarray:
    """Stack variable-length arrays along a new batch dim with padding."""
    if not arrays:
        return np.zeros((0, 0), dtype=np.float32)
    max_len = max(a.shape[0] for a in arrays)
    trailing = arrays[0].shape[1:]
    out = np.full((len(arrays), max_len) + trailing, fill, dtype=arrays[0].dtype)
    for i, a in enumerate(arrays):
        out[i, :a.shape[0]] = a
    return out


@dataclass
class BaseMesh:
    """
    Triangle mesh with exactly one batch dimension.
    ``verts``: BxVxDim float array; ``faces``: BxFx3 int array.
    """
    verts: jnp.ndarray
    faces: jnp.ndarray
    _verts_fill = 0.0
    _faces_fill = 0

    def __post_init__(self):
        if self.verts.ndim == 2:
            self.verts = self.verts[None]
        if self.faces.ndim == 2:
            self.faces = self.faces[None]

    @property
    def dim(self) -> int:
        return self.verts.shape[-1]

    @property
    def batch_size(self) -> int:
        return max(self.verts.shape[0], self.faces.shape[0])

    @property
    def verts_count(self) -> int:
        return self.verts.shape[-2]

    @property
    def faces_count(self) -> int:
        return self.faces.shape[-2]

    @property
    def device(self):
        """Device holding the vertices (ref: `mesh.py:113-115`). Host numpy
        meshes (the `_host` convention) report None; committed jax arrays
        report their single device."""
        devs = getattr(self.verts, 'devices', None)
        if devs is None:
            return None
        devs = devs()
        return next(iter(devs)) if len(devs) == 1 else None

    @property
    def center(self) -> jnp.ndarray:
        """Bx2 midpoint of the vertex bounding box (ref: `mesh.py:118-126`)."""
        if self.verts_count > 0:
            return (jnp.max(self.verts, axis=-2) + jnp.min(self.verts, axis=-2)) / 2
        return jnp.zeros((self.batch_size, 2), dtype=self.verts.dtype)

    # --- functional batch ops -------------------------------------------------

    def to(self, device=None) -> "BaseMesh":
        """Kept for API familiarity; JAX manages placement via sharding."""
        return self

    def clone(self) -> "BaseMesh":
        return copy.copy(self)

    def expand(self, size: int) -> "BaseMesh":
        """Repeat every batch element ``size`` times contiguously."""
        return dataclasses.replace(self, verts=_extend_batch(self.verts, size),
                                   faces=_extend_batch(self.faces, size))

    def select_batch_elements(self, idx) -> "BaseMesh":
        idx = np.asarray(idx) if _host(self.verts) and not isinstance(
            idx, jnp.ndarray) else jnp.asarray(idx)
        return dataclasses.replace(self, verts=self.verts[idx], faces=self.faces[idx])

    def __getitem__(self, item) -> "BaseMesh":
        return self.select_batch_elements(item)

    def translate(self, xy: jnp.ndarray) -> "BaseMesh":
        """Shift the mesh by Bx2 offsets (ref: `mesh.py:155`), functionally."""
        if _host(self.verts, xy):
            shifted = self.verts.copy()
            shifted[..., :2] += np.asarray(xy)[:, None, :]
        else:
            shifted = jnp.asarray(self.verts).at[..., :2].add(xy[:, None, :])
        return dataclasses.replace(self, verts=shifted)

    def offset(self, offset: jnp.ndarray) -> "BaseMesh":
        """Shift all vertices by a constant offset, zero-padded to dim."""
        xp = np if _host(self.verts) and not isinstance(offset, jnp.ndarray) \
            else jnp
        offset = xp.asarray(offset)
        if offset.shape[-1] < self.dim:
            pad = self.dim - offset.shape[-1]
            offset = xp.concatenate(
                [offset, xp.zeros(offset.shape[:-1] + (pad,), offset.dtype)], axis=-1)
        return dataclasses.replace(self, verts=self.verts + offset)

    def pad(self, pad_size: int) -> "BaseMesh":
        """Append ``pad_size`` zero batch elements."""
        def f(x):
            xp = np if _host(x) else jnp
            return xp.concatenate(
                [x, xp.zeros((pad_size,) + x.shape[1:], x.dtype)], axis=0)
        return dataclasses.replace(self, verts=f(self.verts), faces=f(self.faces))

    @classmethod
    def collate(cls, meshes: Sequence["BaseMesh"]) -> "BaseMesh":
        """Batch single-element meshes with padding (ref: `mesh.py:171-183`)."""
        verts = _pad_stack([_np(m.verts)[0] for m in meshes], cls._verts_fill)
        faces = _pad_stack([_np(m.faces)[0] for m in meshes], cls._faces_fill)
        return cls(verts=verts, faces=faces)

    @classmethod
    def concat(cls, meshes: Sequence["BaseMesh"]) -> "BaseMesh":
        """Concatenate meshes into one scene, offsetting face indices."""
        xp = np if _host(*[m.verts for m in meshes],
                         *[m.faces for m in meshes]) else jnp
        verts = xp.concatenate([m.verts for m in meshes], axis=-2)
        offsets = np.concatenate([[0], np.cumsum([m.verts_count for m in meshes])[:-1]])
        faces = xp.concatenate(
            [m.faces + int(off) for m, off in zip(meshes, offsets)], axis=-2)
        return cls(verts=verts, faces=faces)

    def merge(self, other: "BaseMesh") -> "BaseMesh":
        return self.concat([self, other])

    # --- serialization (reference-compatible) --------------------------------

    def serialize(self) -> Dict:
        return {'verts': _np(self.verts).tolist(), 'faces': _np(self.faces).tolist()}

    def save(self, path: str):
        d = os.path.dirname(path)
        if d and not os.path.exists(d):
            os.makedirs(d, exist_ok=True)
        with open(path, 'w') as f:
            json.dump(self.serialize(), f)

    @classmethod
    def _deserialize_tensors(cls, data: Dict) -> Dict:
        out = dict(data)
        out.update(verts=np.asarray(data['verts'], dtype=np.float32),
                   faces=np.asarray(data['faces'], dtype=np.int32))
        return out

    @classmethod
    def deserialize(cls, data: Dict) -> "BaseMesh":
        return cls(**cls._deserialize_tensors(data))

    @classmethod
    def load(cls, path: str) -> "BaseMesh":
        try:
            with open(path, 'r') as f:
                data = json.load(f)
            return cls.deserialize(data)
        except Exception as e:
            raise BadMeshFormat(str(e))

    def pickle(self, path: str):
        d = os.path.dirname(path)
        if d and not os.path.exists(d):
            os.makedirs(d, exist_ok=True)
        # store numpy to keep pickles framework-agnostic
        state = {'cls': type(self).__name__,
                 'fields': {k: _np(v) if isinstance(v, (jnp.ndarray, np.ndarray)) else v
                            for k, v in self.__dict__.items()}}
        with open(path, 'wb') as f:
            _pickle.dump(state, f)

    @classmethod
    def unpickle(cls, path: str, pickle_module: Any = _pickle) -> "BaseMesh":
        with open(path, 'rb') as f:
            state = pickle_module.Unpickler(f).load()
        if isinstance(state, BaseMesh):
            return state
        if not isinstance(state, dict) or 'fields' not in state:
            raise BadMeshFormat
        fields = dict(state['fields'])
        klass = _MESH_CLASSES.get(state.get('cls'), cls)
        return klass(**fields)

    @classmethod
    def empty(cls, dim: int = 2, batch_size: int = 1) -> "BaseMesh":
        return cls(verts=jnp.zeros((batch_size, 0, dim), jnp.float32),
                   faces=jnp.zeros((batch_size, 0, 3), jnp.int32))

    # --- trimming (host-side, data-dependent shapes) --------------------------

    def _trim_verts_faces(self, keep_verts: np.ndarray, trim_face_only: bool = False):
        """
        Drop faces whose vertices are all outside ``keep_verts``; reindex the
        kept vertices (semantics of `mesh.py:308-348`). Host-side numpy.
        Returns (verts BxVsxD, faces BxFsx3, kept_idx BxVs or None).
        """
        verts_np = _np(self.verts)
        faces_np = _np(self.faces).astype(np.int64)
        b = self.batch_size
        kept_faces, kept_verts_list, kept_idx_list = [], [], []
        for i in range(b):
            keep = keep_verts[i]
            fmask = keep[faces_np[i]].any(axis=-1)
            fsel = faces_np[i][fmask]
            if trim_face_only:
                kept_faces.append(fsel)
                continue
            used = np.unique(fsel) if fsel.size else np.zeros((0,), np.int64)
            remap = np.zeros(max(verts_np.shape[1], 1), dtype=np.int64)
            remap[used] = np.arange(len(used))
            kept_faces.append(remap[fsel] if fsel.size else fsel)
            kept_verts_list.append(verts_np[i][used])
            kept_idx_list.append(used)
        faces_out = _pad_stack([f.astype(np.int32) for f in kept_faces], 0) \
            if kept_faces else self.faces
        if trim_face_only:
            return self.verts, faces_out, None
        verts_out = _pad_stack(kept_verts_list, 0.0)
        idx_out = _pad_stack([i.astype(np.int64) for i in kept_idx_list], 0)
        return verts_out, faces_out, idx_out

    def trim(self, polygon: jnp.ndarray, trim_face_only: bool = False) -> "BaseMesh":
        """
        Crop the mesh to a convex polygon (ref: `mesh.py:350-369`).
        Faces with all vertices outside are removed; unused vertices dropped.
        """
        if self.dim != 2:
            raise NotImplementedError("trim only supports 2D meshes")
        keep = _np(is_inside_polygon(self.verts, polygon))
        verts, faces, _ = self._trim_verts_faces(keep, trim_face_only)
        return BaseMesh(verts=verts, faces=faces)


@dataclass
class AttributeMesh(BaseMesh):
    """Mesh with a per-vertex attribute vector (ref: `mesh.py:372-521`)."""
    attrs: jnp.ndarray = None  #: BxVxAttr
    _attrs_fill = 0.0

    def __post_init__(self):
        super().__post_init__()
        if self.attrs is not None and self.attrs.ndim == 2:
            self.attrs = self.attrs[None]

    @property
    def attr_dim(self) -> int:
        return self.attrs.shape[-1]

    @classmethod
    def set_attr(cls, mesh: BaseMesh, attr: jnp.ndarray) -> "AttributeMesh":
        """Assign one attribute value to every vertex."""
        attr = jnp.asarray(attr)
        attrs = jnp.broadcast_to(attr, mesh.verts.shape[:-1] + attr.shape)
        return cls(verts=mesh.verts, faces=mesh.faces, attrs=attrs)

    def expand(self, size: int) -> "AttributeMesh":
        base = super().expand(size)
        return dataclasses.replace(base, attrs=_extend_batch(self.attrs, size))

    def select_batch_elements(self, idx) -> "AttributeMesh":
        idx = jnp.asarray(idx)
        base = super().select_batch_elements(idx)
        return dataclasses.replace(base, attrs=self.attrs[idx])

    def pad(self, pad_size: int) -> "AttributeMesh":
        base = super().pad(pad_size)
        f = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad_size,) + x.shape[1:], x.dtype)], axis=0)
        return dataclasses.replace(base, attrs=f(self.attrs))

    @classmethod
    def concat(cls, meshes) -> "AttributeMesh":
        base = BaseMesh.concat(meshes)
        attrs = jnp.concatenate([m.attrs for m in meshes], axis=-2)
        return cls(verts=base.verts, faces=base.faces, attrs=attrs)

    @classmethod
    def collate(cls, meshes) -> "AttributeMesh":
        base = BaseMesh.collate(meshes)
        attrs = _pad_stack([_np(m.attrs)[0] for m in meshes], cls._attrs_fill)
        return cls(verts=base.verts, faces=base.faces, attrs=attrs)

    def serialize(self) -> Dict:
        data = super().serialize()
        data['attrs'] = _np(self.attrs).tolist()
        return data

    @classmethod
    def _deserialize_tensors(cls, data: Dict) -> Dict:
        out = super()._deserialize_tensors(data)
        out['attrs'] = np.asarray(data['attrs'], dtype=np.float32)
        return out

    @classmethod
    def empty(cls, dim: int = 2, batch_size: int = 1, attr_dim: int = 3) -> "AttributeMesh":
        return cls(verts=jnp.zeros((batch_size, 0, dim), jnp.float32),
                   faces=jnp.zeros((batch_size, 0, 3), jnp.int32),
                   attrs=jnp.zeros((batch_size, 0, attr_dim), jnp.float32))

    def trim(self, polygon: jnp.ndarray, trim_face_only: bool = False) -> "AttributeMesh":
        keep = _np(is_inside_polygon(self.verts, polygon))
        verts, faces, idx = self._trim_verts_faces(keep, trim_face_only)
        if idx is None:
            attrs = self.attrs
        else:
            attrs = np.take_along_axis(_np(self.attrs), idx[..., None], axis=1)
        return dataclasses.replace(self, verts=verts, faces=faces, attrs=attrs)


class RGBMesh(AttributeMesh):
    """AttributeMesh whose attribute is an RGB color in [0,1] (ref: `mesh.py:524`)."""

    @classmethod
    def set_color(cls, mesh: BaseMesh, color: Color) -> "RGBMesh":
        return cls.set_attr(mesh, tensor_color(color, dtype=mesh.verts.dtype))


@dataclass
class BirdviewMesh(BaseMesh):
    """
    2D mesh with per-vertex discrete categories plus per-category color and
    rendering priority z (lower z renders on top). Ref: `mesh.py:541-758`.
    """
    categories: List[str] = dataclasses.field(default_factory=list)
    colors: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    zs: Dict[str, float] = dataclasses.field(default_factory=dict)
    vert_category: jnp.ndarray = None  #: BxV int
    _cat_fill: int = 0

    def __post_init__(self):
        super().__post_init__()
        if self.vert_category is not None and self.vert_category.ndim == 1:
            self.vert_category = self.vert_category[None]

    @property
    def num_categories(self) -> int:
        return len(self.categories)

    @classmethod
    def set_properties(cls, mesh: BaseMesh, category: str,
                       color: Optional[Color] = None, z: Optional[float] = None
                       ) -> "BirdviewMesh":
        """Lift a BaseMesh into a single-category BirdviewMesh."""
        vert_category = jnp.zeros((mesh.batch_size, mesh.verts_count), jnp.int32)
        colors = {category: tensor_color(color)} if color is not None else {}
        zs = {category: z} if z is not None else {}
        return cls(verts=mesh.verts, faces=mesh.faces, categories=[category],
                   colors=colors, zs=zs, vert_category=vert_category)

    def expand(self, size: int) -> "BirdviewMesh":
        base = super().expand(size)
        return dataclasses.replace(base, vert_category=_extend_batch(self.vert_category, size))

    def select_batch_elements(self, idx) -> "BirdviewMesh":
        idx = jnp.asarray(idx)
        base = super().select_batch_elements(idx)
        return dataclasses.replace(base, vert_category=self.vert_category[idx])

    def pad(self, pad_size: int) -> "BirdviewMesh":
        base = super().pad(pad_size)
        f = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad_size,) + x.shape[1:], x.dtype)], axis=0)
        return dataclasses.replace(base, vert_category=f(self.vert_category))

    @classmethod
    def unify(cls, meshes: Sequence["BirdviewMesh"]) -> List["BirdviewMesh"]:
        """Remap all meshes to one shared category list (ref: `mesh.py:612`)."""
        categories = sorted(set().union(*[set(m.categories) for m in meshes])) if meshes else []
        colors = merge_dicts([m.colors for m in meshes])
        zs = merge_dicts([m.zs for m in meshes])
        out = []
        for m in meshes:
            cat_map = np.asarray([categories.index(c) for c in m.categories] or [0],
                                 dtype=np.int32)
            vc = jnp.asarray(cat_map)[m.vert_category.astype(jnp.int32)] \
                if m.verts_count > 0 else m.vert_category
            out.append(dataclasses.replace(
                m, categories=categories, vert_category=vc, colors=colors, zs=zs))
        return out

    @classmethod
    def concat(cls, meshes: Sequence["BirdviewMesh"]) -> "BirdviewMesh":
        meshes = cls.unify(meshes)
        base = BaseMesh.concat(meshes)
        vert_category = jnp.concatenate(
            [m.vert_category.astype(jnp.int32) for m in meshes], axis=-1)
        first = meshes[0] if meshes else None
        return cls(verts=base.verts, faces=base.faces,
                   categories=first.categories if first else [],
                   colors=first.colors if first else {}, zs=first.zs if first else {},
                   vert_category=vert_category)

    @classmethod
    def collate(cls, meshes: Sequence["BirdviewMesh"]) -> "BirdviewMesh":
        meshes = cls.unify(meshes)
        base = BaseMesh.collate(meshes)
        vert_category = _pad_stack(
            [_np(m.vert_category)[0].astype(np.int32) for m in meshes], cls._cat_fill)
        first = meshes[0] if meshes else None
        return cls(verts=base.verts, faces=base.faces,
                   categories=first.categories if first else [],
                   colors=first.colors if first else {}, zs=first.zs if first else {},
                   vert_category=vert_category)

    def fill_attr(self) -> RGBMesh:
        """
        Resolve categories to explicit per-vertex colors and z coordinates
        (ref: `mesh.py:663-683`): output verts are (x, y, z) where z encodes
        rendering priority.
        """
        missing_colors = [c for c in self.categories if c not in self.colors]
        if missing_colors:
            raise RuntimeError(f"Missing colors for categories: {missing_colors}")
        missing_zs = [c for c in self.categories if c not in self.zs]
        if missing_zs:
            raise RuntimeError(f"Missing z values for categories: {missing_zs}")
        cat = self.vert_category.astype(jnp.int32)
        zs = jnp.asarray([float(self.zs[k]) for k in self.categories],
                         dtype=self.verts.dtype)
        z = zs[cat][..., None] if self.categories else \
            jnp.zeros(self.verts.shape[:-1] + (1,), self.verts.dtype)
        if self.categories:
            color_table = jnp.stack(
                [tensor_color(self.colors[k]) for k in self.categories]
            ).astype(self.verts.dtype)
            colors = color_table[cat]
        else:
            colors = jnp.zeros((self.batch_size, 0, 3), self.verts.dtype)
        verts = jnp.concatenate([self.verts[..., :2], z], axis=-1)
        return RGBMesh(verts=verts, faces=self.faces, attrs=colors)

    def serialize(self) -> Dict:
        data = super().serialize()
        data.update({
            'categories': self.categories,
            'colors': {k: _np(v).tolist() for k, v in self.colors.items()},
            'zs': self.zs,
            'vert_category': _np(self.vert_category).tolist(),
            '_cat_fill': self._cat_fill,
        })
        return data

    @classmethod
    def _deserialize_tensors(cls, data: Dict) -> Dict:
        out = super()._deserialize_tensors(data)
        out.update(categories=data['categories'],
                   colors={k: np.asarray(v, dtype=np.float32)
                           for k, v in data['colors'].items()},
                   zs=data['zs'],
                   vert_category=np.asarray(data['vert_category'],
                                            dtype=np.int32),
                   _cat_fill=data.get('_cat_fill', 0))
        return out

    @classmethod
    def empty(cls, dim: int = 2, batch_size: int = 1) -> "BirdviewMesh":
        return cls(verts=jnp.zeros((batch_size, 0, dim), jnp.float32),
                   faces=jnp.zeros((batch_size, 0, 3), jnp.int32),
                   categories=[], colors={}, zs={},
                   vert_category=jnp.zeros((batch_size, 0), jnp.int32))

    def trim(self, polygon: jnp.ndarray, trim_face_only: bool = False) -> "BirdviewMesh":
        keep = _np(is_inside_polygon(self.verts, polygon))
        verts, faces, idx = self._trim_verts_faces(keep, trim_face_only)
        if idx is None:
            vc = self.vert_category
        else:
            vc = np.take_along_axis(
                _np(self.vert_category), idx, axis=1).astype(np.int32)
        return dataclasses.replace(self, verts=verts, faces=faces, vert_category=vc)

    def separate_by_category(self) -> Dict[str, BaseMesh]:
        """Split into one BaseMesh per category (ref: `mesh.py:748-758`)."""
        out = {}
        for i, category in enumerate(self.categories):
            keep = _np(self.vert_category == i)
            verts, faces, _ = self._trim_verts_faces(keep, trim_face_only=False)
            out[category] = BaseMesh(verts=verts, faces=faces)
        return out


_MESH_CLASSES = {c.__name__: c for c in (BaseMesh, AttributeMesh, RGBMesh, BirdviewMesh)}


# ----------------------------------------------------------------------------
# PyTree registration: meshes flow through jit/scan/grad boundaries
# ----------------------------------------------------------------------------

def _register_mesh_pytrees():
    import jax

    def base_flatten(m):
        return (m.verts, m.faces), None

    def base_unflatten(aux, children):
        return BaseMesh(verts=children[0], faces=children[1])

    jax.tree_util.register_pytree_node(BaseMesh, base_flatten, base_unflatten)

    def attr_flatten(m):
        return (m.verts, m.faces, m.attrs), None

    def make_attr_unflatten(cls):
        def unflatten(aux, children):
            return cls(verts=children[0], faces=children[1], attrs=children[2])
        return unflatten

    jax.tree_util.register_pytree_node(
        AttributeMesh, attr_flatten, make_attr_unflatten(AttributeMesh))
    jax.tree_util.register_pytree_node(
        RGBMesh, attr_flatten, make_attr_unflatten(RGBMesh))

    def bv_flatten(m):
        colors = tuple(sorted(
            (k, tuple(float(c) for c in _np(v).reshape(-1)))
            for k, v in m.colors.items()))
        zs = tuple(sorted((k, float(v)) for k, v in m.zs.items()))
        aux = (tuple(m.categories), colors, zs, m._cat_fill)
        return (m.verts, m.faces, m.vert_category), aux

    def bv_unflatten(aux, children):
        categories, colors, zs, cat_fill = aux
        return BirdviewMesh(
            verts=children[0], faces=children[1], vert_category=children[2],
            categories=list(categories),
            colors={k: jnp.asarray(v) for k, v in colors},
            zs=dict(zs), _cat_fill=cat_fill)

    jax.tree_util.register_pytree_node(BirdviewMesh, bv_flatten, bv_unflatten)


_register_mesh_pytrees()


# ----------------------------------------------------------------------------
# Mesh constructors (ref: `mesh.py:1160-1290`)
# ----------------------------------------------------------------------------

def rendering_mesh(mesh: BaseMesh, category: str) -> BirdviewMesh:
    """Assign a category to a mesh (ref: `mesh.py:1160`)."""
    return BirdviewMesh.set_properties(
        BaseMesh(verts=mesh.verts, faces=mesh.faces), category=category)


def set_colors_with_defaults(mesh: BirdviewMesh, color_map: Dict[str, Tuple[int, int, int]],
                             rendering_levels: Dict[str, float]) -> RGBMesh:
    """Fill missing colors/zs from defaults and resolve to RGB (ref: `mesh.py:1170`)."""
    colors = dict(mesh.colors)
    zs = dict(mesh.zs)
    for k in mesh.categories:
        if k not in colors:
            colors[k] = tensor_color(color_map[k])
        if k not in zs:
            zs[k] = rendering_levels[k]
    return dataclasses.replace(mesh, colors=colors, zs=zs).fill_attr()


def generate_trajectory_mesh(points: jnp.ndarray, category: Optional[str] = None,
                             edge_length: float = 1.0):
    """
    One triangle per trajectory point, oriented along it (ref: `mesh.py:1181`).

    Args:
        points: BxNx3 (x, y, psi).
    """
    angles = jnp.asarray([0.0, 2 * math.pi / 3, 4 * math.pi / 3])
    psi = points[..., 2:3] + angles  # BxNx3
    vx = points[..., 0:1] + edge_length * 0.5 * jnp.cos(psi)
    vy = points[..., 1:2] + edge_length * 0.5 * jnp.sin(psi)
    verts = jnp.stack([vx, vy], axis=-1)  # BxNx3x2
    b, n = verts.shape[0], verts.shape[1]
    verts = verts.reshape(b, n * 3, 2)
    faces = jnp.arange(n * 3, dtype=jnp.int32).reshape(1, n, 3)
    faces = jnp.broadcast_to(faces, (b, n, 3))
    mesh = BaseMesh(verts=verts, faces=faces)
    if category is not None:
        mesh = rendering_mesh(mesh, category)
    return mesh


def generate_annulus_polygon_mesh(polygon: jnp.ndarray, scaling_factor: float,
                                  origin: jnp.ndarray, category: Optional[str] = None):
    """
    Mesh covering the ring between a polygon and its scaled copy
    (ref: `mesh.py:1209`); used for map-boundary visualisation.

    Args:
        polygon: Nx2 polygon hull points; origin: (2,) scaling center.
    """
    polygon = jnp.asarray(polygon)
    center = jnp.asarray(origin)[:2][None]
    outer = (polygon - center) * scaling_factor + center
    verts = jnp.stack([polygon, outer], axis=1).reshape(-1, 2)
    n_verts = verts.shape[0]
    # triangle strip around the ring, wrapping at the end
    idx = np.arange(n_verts - 2)
    faces = np.stack([idx, idx + 1, idx + 2], axis=-1)
    faces = np.concatenate([
        faces,
        np.asarray([[n_verts - 2, n_verts - 1, 0], [n_verts - 1, 0, 1]]),
    ], axis=0).astype(np.int32)
    mesh = BaseMesh(verts=verts[None], faces=jnp.asarray(faces)[None])
    if category is not None:
        mesh = rendering_mesh(mesh, category)
    return mesh


def generate_disc_mesh(radius: float = 2.0, num_triangles: int = 10
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Triangle-fan disc (ref: `mesh.py:1243`): center vertex + rim vertices.
    Returns (verts (num_triangles+1)x2, faces num_trianglesx3).
    """
    angles = np.linspace(0, 2 * np.pi, num_triangles, endpoint=False)
    rim = np.stack([radius * np.cos(angles), radius * np.sin(angles)], axis=-1)
    verts = np.concatenate([np.zeros((1, 2)), rim], axis=0).astype(np.float32)
    idx = np.arange(num_triangles)
    faces = np.stack([np.zeros_like(idx), idx + 1, (idx + 1) % num_triangles + 1],
                     axis=-1).astype(np.int32)
    # host arrays: this is a scenario-construction template (see _host)
    return verts, faces


def build_verts_faces_from_bounding_box(bbs: jnp.ndarray, z: float = 2
                                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """
    Triangulate box corner sets for rendering (ref: `mesh.py:1274`).
    Input ...xAx4x2 corners; output (...x4Ax2 verts, ...x2Ax3 faces).
    """
    batch_dims = bbs.shape[:-3]
    n = bbs.shape[-3]
    verts = bbs.reshape(batch_dims + (n * 4, 2))
    base = np.asarray([[0, 1, 3], [1, 3, 2]], dtype=np.int32)
    offs = (4 * np.arange(n, dtype=np.int32))[:, None, None]
    faces = (base[None] + offs).reshape(n * 2, 3)
    faces = jnp.broadcast_to(jnp.asarray(faces), batch_dims + (n * 2, 3))
    return verts, faces
