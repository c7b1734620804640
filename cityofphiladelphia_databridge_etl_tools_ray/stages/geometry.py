"""EWKT geometry string transforms — vectorized Arrow ports of the
reference's flagship per-record fixups.

- :func:`promote_multi_geom` — the ``prepare_file`` multi-geometry
  promotion (reference databridge_etl_tools/postgres/postgres.py:146-201):
  derive the row's geometry kind from the EWKT prefix and wrap
  non-MULTI values as ``MULTI<KIND>( ... )``, preserving the
  ``SRID=n;`` prefix.  The reference does this row-at-a-time with
  petl ``convert(pass_row)``; here it is one ``pc.extract_regex`` +
  conditional concat per batch.
- :func:`extract_point_lonlat` — the OpenData lat/lng derivation
  (reference opendata/opendata.py:214-238): capture the SRID and the
  POINT coordinates, emit them as columns, drop the shape string.
  Reprojection to 4326 (pyproj in the reference, cached per worker,
  ago/ago.py:347-354) is stubbed: SRID 4326 passes through, anything
  else raises ``NotImplementedError`` unless ``assume_lonlat=True``.

Both run inside ``map_batches(..., batch_format="pyarrow")``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_EWKT_RE = r"^(?:SRID=(?P<srid>[0-9]+);)?(?P<kind>[A-Z]+)\s*(?P<body>\(.*\))$"
_PROMOTABLE = ("POINT", "LINESTRING", "POLYGON")
_POINT_RE = r"^(?:SRID=(?P<srid>[0-9]+);)?POINT\s*\(\s*(?P<lon>-?[0-9.]+)\s+(?P<lat>-?[0-9.]+)\s*\)$"


def _combine(arr):
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def promote_multi_geom(batch: pa.Table, geom_col: str = "shape") -> pa.Table:
    """Wrap single-geometry EWKT values as their MULTI equivalent.

    ``POINT(1 2)`` → ``MULTIPOINT((1 2))``; already-MULTI and
    non-geometry-shaped values pass through unchanged; the SRID prefix
    is preserved.  The type-widening mirrors the reference's
    GEOM_TYPE_MAP promotion (polygon→MultiPolygon,
    postgres/postgres_map.py:19-27).
    """
    col = _combine(batch.column(geom_col))
    parts = pc.extract_regex(col, pattern=_EWKT_RE)
    kind = pc.struct_field(parts, "kind")
    srid = pc.struct_field(parts, "srid")
    body = pc.struct_field(parts, "body")

    is_promotable = pc.is_in(kind, value_set=pa.array(list(_PROMOTABLE)))
    # unmatched optional regex groups come back as "" (not null)
    has_srid = pc.and_(pc.is_valid(srid), pc.not_equal(srid, pa.scalar("")))
    srid_prefix = pc.if_else(
        has_srid,
        pc.binary_join_element_wise(pa.scalar("SRID="), srid, pa.scalar(";"), ""),
        pa.scalar(""),
    )
    promoted = pc.binary_join_element_wise(
        srid_prefix, pa.scalar("MULTI"), kind, pa.scalar("("), body, pa.scalar(")"), ""
    )
    out = pc.if_else(is_promotable, promoted, col)
    # unparseable values pass through untouched (extract_regex → null)
    out = pc.if_else(pc.is_valid(parts), out, col)
    i = batch.column_names.index(geom_col)
    return batch.set_column(i, batch.schema.field(i), out)


def extract_point_lonlat(
    batch: pa.Table,
    geom_col: str = "shape",
    *,
    assume_lonlat: bool = False,
    drop_geom: bool = True,
) -> pa.Table:
    """EWKT POINT column → ``lon`` / ``lat`` float64 columns.

    Non-4326 SRIDs need reprojection, which requires pyproj — absent
    here, so they raise unless ``assume_lonlat=True`` (the
    deterministic-fake escape hatch; the real Transformer plugs into
    an actor-pool stage exactly like stages/multimodal.FakeCodec).
    """
    col = _combine(batch.column(geom_col))
    parts = pc.extract_regex(col, pattern=_POINT_RE)
    srid = pc.struct_field(parts, "srid")
    if not assume_lonlat:
        non4326 = pc.and_(
            pc.and_(pc.is_valid(srid), pc.not_equal(srid, pa.scalar(""))),
            pc.not_equal(srid, pa.scalar("4326")),
        )
        if pc.any(pc.fill_null(non4326, False)).as_py():
            bad = pc.unique(srid.filter(pc.fill_null(non4326, False))).to_pylist()
            raise NotImplementedError(
                f"reprojection from SRID {bad} requires pyproj; "
                "pass assume_lonlat=True to skip"
            )
    lon = pc.cast(pc.struct_field(parts, "lon"), pa.float64())
    lat = pc.cast(pc.struct_field(parts, "lat"), pa.float64())
    batch = batch.append_column("lon", lon).append_column("lat", lat)
    if drop_geom:
        batch = batch.drop_columns([geom_col])
    return batch


# -- reprojection ----------------------------------------------------

#: The reference's bad-SRID correction map, verbatim
#: (opendata/opendata.py:202-205): data registered under
#: nonexistent local SRIDs is corrected to its true CRS first.
BAD_SRID_MAP = {
    300001: 2272, 300003: 2272, 300046: 2272, 300006: 2272, 300010: 2272,
    300008: 2272, 300004: 2272, 300007: 2272, 300067: 2272, 300100: 2272,
    300101: 2272, 300084: 3857, 300073: 4326, 300042: 4326, 300090: 4269,
    300091: 4326, 300092: 4326, 300086: 6565, 300087: 6565, 300093: 2272,
}

#: Deterministic affine FAKE transforms — retained ONLY as the
#: last-resort fallback for SRIDs outside the REAL registry
#: (functions/projection.py now implements the genuine math for every
#: CRS the reference's bad-SRID map routes to: 2272/6565 Lambert
#: Conformal Conic, 3857 Web Mercator, 4269 identity).  Expressions
#: are SQL-reproducible bit-exactly (same IEEE op order).
_FAKE_AFFINE = {
    2272: (100000.0, -75.0, 100000.0, 39.0),
    3857: (111320.0, 0.0, 110540.0, 0.0),
    4269: (1.0, 0.0, 1.0, 0.0),
    6565: (100000.0, -75.0, 100000.0, 39.0),
}


class PointReprojector:
    """Actor-pool reprojection stage: EWKT POINT column → ``lon`` /
    ``lat`` in ``to_srid`` (the reference's project_shape pipeline,
    opendata/opendata.py:206-238 + the per-worker-cached Transformer,
    ago/ago.py:347-354).

    The transformer cache is built once per actor in ``__init__``;
    ``__call__`` groups the batch by source SRID and transforms each
    group's coordinate arrays in one vectorized call.

    Transform resolution order per source SRID:

    1. same as ``to_srid`` → identity;
    2. ``pyproj.Transformer`` when the library is importable (cached
       per SRID — the reference's per-worker cache);
    3. the REAL built-in math (functions/projection.py) when the
       target is 4326 and the SRID is in its registry — Lambert
       Conformal Conic for 2272/6565, Web Mercator for 3857, NAD83
       identity for 4269: the full CRS set the reference's bad-SRID
       map routes to, so the engine reprojects the reference's actual
       data with NO external library;
    4. otherwise: raise under ``strict=True``, else the documented
       deterministic affine fake (unknown SRIDs only).
    """

    def __init__(
        self,
        geom_col: str = "shape",
        *,
        to_srid: int = 4326,
        default_srid: int | None = None,
        strict: bool = False,
        drop_geom: bool = True,
    ):
        self.geom_col = geom_col
        self.to_srid = to_srid
        self.default_srid = default_srid
        self.strict = strict
        self.drop_geom = drop_geom
        self._transformers: dict[int, object] = {}
        try:  # REAL-LIBRARY SITE: pyproj.Transformer.from_crs per SRID
            import pyproj  # noqa: F401

            self._pyproj = pyproj
        except ImportError:
            self._pyproj = None

    def _transform(self, srid: int, x, y):
        if srid == self.to_srid:
            return x, y
        if self._pyproj is not None:
            tr = self._transformers.get(srid)
            if tr is None:
                tr = self._pyproj.Transformer.from_crs(
                    f"epsg:{srid}", f"epsg:{self.to_srid}", always_xy=True
                )
                self._transformers[srid] = tr
            return tr.transform(x, y)
        if self.to_srid == 4326:
            from ..functions.projection import REAL_SRIDS, to_wgs84

            if srid in REAL_SRIDS:
                return to_wgs84(srid, x, y)
        if self.strict:
            raise NotImplementedError(
                f"strict reprojection from SRID {srid} to {self.to_srid} "
                "requires pyproj (outside the built-in real-CRS registry)"
            )
        if srid not in _FAKE_AFFINE:
            raise ValueError(f"no transform for SRID {srid} → {self.to_srid}")
        dx, ox, dy, oy = _FAKE_AFFINE[srid]
        return x / dx + ox, y / dy + oy

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        col = _combine(batch.column(self.geom_col))
        parts = pc.extract_regex(col, pattern=_POINT_RE)
        if pc.any(pc.is_null(parts)).as_py():
            bad = col.filter(pc.is_null(parts))[:3].to_pylist()
            raise ValueError(f"non-POINT or unparseable EWKT values: {bad}")
        srid_s = pc.struct_field(parts, "srid")
        x = pc.cast(pc.struct_field(parts, "lon"), pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.struct_field(parts, "lat"), pa.float64()).to_numpy(zero_copy_only=False)
        srid_s = pc.if_else(pc.equal(srid_s, pa.scalar("")), pa.scalar("0"), srid_s)
        srid = pc.cast(srid_s, pa.int64()).to_numpy(zero_copy_only=False).copy()
        if self.default_srid is not None:
            srid[srid == 0] = self.default_srid
        elif (srid == 0).any():
            raise ValueError("EWKT values without SRID= and no default_srid given")

        lon = np.empty_like(x)
        lat = np.empty_like(y)
        for s in np.unique(srid):
            s_true = BAD_SRID_MAP.get(int(s), int(s))
            m = srid == s
            lon[m], lat[m] = self._transform(s_true, x[m], y[m])
        batch = batch.append_column("lon", pa.array(lon)).append_column("lat", pa.array(lat))
        if self.drop_geom:
            batch = batch.drop_columns([self.geom_col])
        return batch


# -- full-geometry reprojection (coordinate streams) -----------------

_TOKEN_RE = (
    r"^(?P<pre>[\s(]*)"
    r"(?P<x>-?[0-9][0-9.eE+\-]*)\s+(?P<y>-?[0-9][0-9.eE+\-]*)"
    r"(?P<post>[\s)]*)$"
)


class GeomReprojector(PointReprojector):
    """Whole-geometry EWKT reprojection — the reference's
    ``project_and_format_shape`` walks every coordinate pair of
    POINT/LINESTRING/POLYGON rows through pyproj row-at-a-time
    (opendata/opendata.py:206-238); here the entire batch's
    coordinate STREAM transforms in one pass, any geometry kind and
    nesting depth:

    1. one regex parse per row → (srid, kind, body);
    2. ``pc.split_pattern(body, ",")`` → a ListArray whose FLAT values
       are coordinate tokens with their surrounding paren runs;
    3. one regex parse over the flat token array → (pre, x, y, post),
       float-cast → two numpy arrays for the WHOLE batch;
    4. transform per source SRID (same resolution order as
       :class:`PointReprojector` — row srids repeat to token srids via
       the list offsets);
    5. reassemble: join each token's pieces, ``pc.binary_join`` the
       token lists back with ",", prepend ``SRID=<to>;KIND``.

    No Python loop touches a row or a coordinate."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        col = _combine(batch.column(self.geom_col))
        parts = pc.extract_regex(col, pattern=_EWKT_RE)
        if pc.any(pc.is_null(parts)).as_py():
            bad = col.filter(pc.is_null(parts))[:3].to_pylist()
            raise ValueError(f"unparseable EWKT values: {bad}")
        srid_s = pc.struct_field(parts, "srid")
        kind = pc.struct_field(parts, "kind")
        body = pc.struct_field(parts, "body")

        srid_s = pc.if_else(pc.equal(srid_s, pa.scalar("")), pa.scalar("0"), srid_s)
        srid = pc.cast(srid_s, pa.int64()).to_numpy(zero_copy_only=False).copy()
        if self.default_srid is not None:
            srid[srid == 0] = self.default_srid
        elif (srid == 0).any():
            raise ValueError("EWKT values without SRID= and no default_srid given")

        toks = pc.split_pattern(body, ",")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = toks.offsets.to_numpy()
        flat = toks.values
        tp = pc.extract_regex(flat, pattern=_TOKEN_RE)
        if pc.any(pc.is_null(tp)).as_py():
            bad = flat.filter(pc.is_null(tp))[:3].to_pylist()
            raise ValueError(f"unparseable coordinate tokens: {bad}")
        x = pc.cast(pc.struct_field(tp, "x"), pa.float64()).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.struct_field(tp, "y"), pa.float64()).to_numpy(zero_copy_only=False)

        # row srid → token srid via the list offsets
        tok_srid = np.repeat(srid, np.diff(offsets))
        lon = np.empty_like(x)
        lat = np.empty_like(y)
        for s in np.unique(tok_srid):
            s_true = BAD_SRID_MAP.get(int(s), int(s))
            m = tok_srid == s
            lon[m], lat[m] = self._transform(s_true, x[m], y[m])

        new_flat = pc.binary_join_element_wise(
            pc.struct_field(tp, "pre"),
            pc.cast(pa.array(lon), pa.string()),
            pa.scalar(" "),
            pc.cast(pa.array(lat), pa.string()),
            pc.struct_field(tp, "post"),
            "",
        )
        joined = pc.binary_join(
            pa.ListArray.from_arrays(toks.offsets, new_flat), ","
        )
        out = pc.binary_join_element_wise(
            pa.scalar(f"SRID={self.to_srid};"), kind, joined, ""
        )
        i = batch.column_names.index(self.geom_col)
        return batch.set_column(i, pa.field(self.geom_col, pa.string()), out)
