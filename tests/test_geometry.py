"""EWKT geometry stage tests (reference: prepare_file multi-geom
promotion postgres/postgres.py:146-201; OpenData lat/lng
opendata/opendata.py:214-238; fixture edge rows incl. MULTIPOINT EMPTY
tests/fixtures_data/staging/point_table_2272.csv)."""

import pyarrow as pa
import pytest

from cityofphiladelphia_databridge_etl_tools_ray.stages.geometry import (
    extract_point_lonlat,
    promote_multi_geom,
)


def shapes(vals):
    return pa.table({"id": pa.array(range(len(vals)), pa.int64()), "shape": pa.array(vals)})


def test_promote_wraps_singles_preserves_multis_and_srid():
    t = promote_multi_geom(shapes([
        "POINT(1 2)",
        "SRID=2272;POLYGON((0 0, 1 0, 1 1, 0 0))",
        "MULTIPOINT((3 4))",
        "LINESTRING(0 0, 5 5)",
    ]))
    assert t.column("shape").to_pylist() == [
        "MULTIPOINT((1 2))",
        "SRID=2272;MULTIPOLYGON(((0 0, 1 0, 1 1, 0 0)))",
        "MULTIPOINT((3 4))",
        "MULTILINESTRING((0 0, 5 5))",
    ]


def test_promote_passes_through_unparseable_and_null():
    vals = ["not a geom", None, "", "MULTIPOINT EMPTY"]
    t = promote_multi_geom(shapes(vals))
    assert t.column("shape").to_pylist() == vals


def test_lonlat_extraction_and_negative_coords():
    t = extract_point_lonlat(shapes(["POINT(-75.16 39.95)", "SRID=4326;POINT(0 -9.5)"]))
    assert "shape" not in t.column_names
    assert t.column("lon").to_pylist() == [-75.16, 0.0]
    assert t.column("lat").to_pylist() == [39.95, -9.5]


def test_lonlat_non4326_raises_without_escape_hatch():
    with pytest.raises(NotImplementedError, match="2272"):
        extract_point_lonlat(shapes(["SRID=2272;POINT(2693709 235353)"]))
    t = extract_point_lonlat(
        shapes(["SRID=2272;POINT(2693709 235353)"]), assume_lonlat=True
    )
    assert t.column("lon")[0].as_py() == 2693709.0


def test_lonlat_non_point_rows_become_null():
    t = extract_point_lonlat(shapes(["LINESTRING(0 0, 1 1)", "POINT(7 8)"]))
    assert t.column("lon").to_pylist() == [None, 7.0]


# -- lookup enrichment (stages/enrich.py) ----------------------------


def test_geocode_enrich_hits_and_failures():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.enrich import FakeGeocoder, GeocodeEnrich

    t = pa.table({"k": pa.array(["main st", "bad addr", None, "main st"])})
    out = GeocodeEnrich("k")(t)
    ok = out.column("geocode_ok").to_pylist()
    assert ok == [True, False, False, True]
    assert out.column("std_address").to_pylist()[0] == "MAIN ST"
    assert out.column("lon")[1].as_py() is None
    # duplicate keys resolve identically (per-batch dedup correctness)
    assert out.column("lon")[0].as_py() == out.column("lon")[3].as_py()


def test_geocode_failure_count_aggregate(ray_session):
    import ray.data
    from cityofphiladelphia_databridge_etl_tools_ray.stages.enrich import (
        GeocodeEnrich,
        geocode_failure_count,
    )

    ds = ray.data.from_items([{"k": "x"}, {"k": "bad one"}, {"k": "y"}])
    enriched = ds.map_batches(GeocodeEnrich, fn_constructor_kwargs={"key_col": "k"},
                              batch_format="pyarrow", concurrency=1)
    assert geocode_failure_count(enriched) == 1


def test_point_reprojector_real_math_and_bad_srid():
    """REAL projection path (functions/projection.py): SRID 2272
    transforms through the genuine Lambert Conformal Conic inverse,
    bad SRID 300001 is corrected to 2272 first (reference
    opendata/opendata.py:202-205), 4326 passes through.  Expected
    values = the module's own inverse, cross-pinned in
    test_projection.py against the EPSG defining invariants."""
    from cityofphiladelphia_databridge_etl_tools_ray.functions.projection import to_wgs84
    from cityofphiladelphia_databridge_etl_tools_ray.stages.geometry import PointReprojector

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "shape": pa.array(
                [
                    "SRID=2272;POINT(2700000 210000)",
                    "SRID=300001;POINT(2700000 210000)",  # → treated as 2272
                    "SRID=4326;POINT(-75 40)",
                ]
            ),
        }
    )
    out = PointReprojector("shape")(t)
    assert out.column_names == ["id", "lon", "lat"]
    lon, lat = out.column("lon").to_pylist(), out.column("lat").to_pylist()
    exp_lon, exp_lat = to_wgs84(2272, 2700000.0, 210000.0)
    assert lon[0] == lon[1] == float(exp_lon)
    assert lat[0] == lat[1] == float(exp_lat)
    # sanity: the point sits in southeastern Pennsylvania
    assert -75.5 < lon[0] < -74.9 and 39.8 < lat[0] < 40.1
    assert (lon[2], lat[2]) == (-75.0, 40.0)


def test_point_reprojector_default_srid_and_errors():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.geometry import PointReprojector

    from cityofphiladelphia_databridge_etl_tools_ray.functions.projection import to_wgs84

    t = pa.table({"shape": pa.array(["POINT(2700000 210000)"])})
    out = PointReprojector("shape", default_srid=2272)(t)
    assert out.column("lon")[0].as_py() == float(to_wgs84(2272, 2700000.0, 210000.0)[0])
    with pytest.raises(ValueError, match="no default_srid"):
        PointReprojector("shape")(t)
    with pytest.raises(ValueError, match="unparseable"):
        PointReprojector("shape")(pa.table({"shape": pa.array(["LINESTRING(0 0, 1 1)"])}))
    # strict mode: SRIDs covered by the REAL registry work without
    # pyproj; an unregistered SRID still raises at the pyproj seam
    strict = PointReprojector("shape", strict=True, default_srid=2272)
    assert strict(t).column("lon")[0].as_py() == float(to_wgs84(2272, 2700000.0, 210000.0)[0])
    with pytest.raises(NotImplementedError, match="pyproj"):
        PointReprojector("shape", strict=True, default_srid=27700)(t)


def test_write_csv_gzip_roundtrip_and_idempotence(ray_session, tmp_path):
    """The OpenData gzip-CSV sink (opendata/opendata.py:68-75):
    per-block gzip level-7 parts, content-hash named (a rerun rewrites
    the identical file set), readable back as CSV."""
    import os

    import pandas as pd
    import ray.data
    from cityofphiladelphia_databridge_etl_tools_ray.stages.publish import write_csv_gzip

    t = pa.table(
        {
            "id": pa.array(range(1000), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(1000)]),
        }
    )
    out = str(tmp_path / "csv_out")
    m = write_csv_gzip(ray.data.from_arrow(t).repartition(4), out)
    assert m["rows"].sum() == 1000
    files = sorted(os.listdir(out))
    assert files and all(f.endswith(".csv.gz") for f in files)
    back = pd.concat(
        [pd.read_csv(os.path.join(out, f), compression="gzip") for f in files]
    ).sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, t.to_pandas())
    # idempotence: a rerun (retried tasks) produces the same file set
    write_csv_gzip(ray.data.from_arrow(t).repartition(4), out)
    assert sorted(os.listdir(out)) == files


def test_geom_reprojector_full_geometry_stream():
    """Whole-geometry reprojection: every coordinate of a nested
    MULTIPOLYGON (hole ring included) goes through the REAL LCC
    inverse; paren nesting, kind and token order are preserved; 4326
    rows pass through numerically unchanged."""
    import numpy as np

    from cityofphiladelphia_databridge_etl_tools_ray.functions.projection import to_wgs84
    from cityofphiladelphia_databridge_etl_tools_ray.stages.geometry import GeomReprojector

    shape = (
        "SRID=2272;MULTIPOLYGON(((2694000 236000, 2695000 236000, 2694000 237000, 2694000 236000), "
        "(2694200 236200, 2694300 236200, 2694200 236300, 2694200 236200)))"
    )
    t = pa.table(
        {
            "shape": pa.array(
                [shape, "SRID=4326;LINESTRING(-75 40, -75.1 40.1)"]
            )
        }
    )
    out = GeomReprojector("shape")(t).column("shape").to_pylist()
    assert out[0].startswith("SRID=4326;MULTIPOLYGON(((")
    assert out[0].count("(") == shape.count("(") and out[0].count(")") == shape.count(")")
    # every vertex equals the per-point real transform
    import re

    got = [
        (float(x), float(y))
        for x, y in re.findall(r"(-?[\d.]+) (-?[\d.]+)", out[0])
    ]
    src = [
        (float(x), float(y))
        for x, y in re.findall(r"(-?[\d.]+) (-?[\d.]+)", shape)
    ]
    for (glon, glat), (sx, sy) in zip(got, src):
        elon, elat = to_wgs84(2272, sx, sy)
        assert abs(glon - float(elon)) < 1e-9 and abs(glat - float(elat)) < 1e-9
    assert len(got) == 8
    # 4326 passthrough: values unchanged
    assert out[1] == "SRID=4326;LINESTRING(-75 40, -75.1 40.1)"


def test_geom_reprojector_errors_and_default_srid():
    from cityofphiladelphia_databridge_etl_tools_ray.stages.geometry import GeomReprojector

    with pytest.raises(ValueError, match="unparseable EWKT"):
        GeomReprojector("shape")(pa.table({"shape": pa.array(["garbage"])}))
    with pytest.raises(ValueError, match="no default_srid"):
        GeomReprojector("shape")(pa.table({"shape": pa.array(["POINT(1 2)"])}))
    out = GeomReprojector("shape", default_srid=4326)(
        pa.table({"shape": pa.array(["LINESTRING(-75 40, -74 41)"])})
    )
    assert out.column("shape")[0].as_py() == "SRID=4326;LINESTRING(-75 40, -74 41)"


def test_geom_and_point_reprojector_agree_on_points():
    """Consistency law: for pure POINT rows the whole-geometry
    reprojector and the point stage must produce identical
    coordinates (same transform chain, different parsers)."""
    from cityofphiladelphia_databridge_etl_tools_ray.stages.geometry import (
        GeomReprojector,
        PointReprojector,
    )

    shapes = pa.array(
        [
            "SRID=2272;POINT(2694000 236000)",
            "SRID=300001;POINT(2600000 150000)",  # bad-SRID corrected
            "SRID=3857;POINT(-8367000 4859000)",
            "SRID=4326;POINT(-75 40)",
        ]
    )
    pt = PointReprojector("shape")(pa.table({"shape": shapes}))
    gm = GeomReprojector("shape")(pa.table({"shape": shapes}))
    import re

    for i in range(len(shapes)):
        m = re.match(r"SRID=4326;POINT\((-?[\d.]+) (-?[\d.]+)\)", gm.column("shape")[i].as_py())
        assert m, gm.column("shape")[i].as_py()
        assert abs(float(m.group(1)) - pt.column("lon")[i].as_py()) < 1e-12
        assert abs(float(m.group(2)) - pt.column("lat")[i].as_py()) < 1e-12
