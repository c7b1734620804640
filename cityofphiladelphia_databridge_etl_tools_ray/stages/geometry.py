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
