"""Property-based tests (hypothesis) for the pure-python geo module."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from taxi_trips_etl_spark.functions.geo import latlng_to_cell, wkt_centroid

lat = st.floats(min_value=-85, max_value=85, allow_nan=False, width=64)
lng = st.floats(min_value=-179, max_value=179, allow_nan=False, width=64)
side = st.floats(min_value=1e-4, max_value=1.0, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lng, lat, side)
def test_rect_centroid_is_center_and_inside(x0, y0, s):
    wkt = (
        f"POLYGON(({x0} {y0}, {x0 + s} {y0}, {x0 + s} {y0 + s}, "
        f"{x0} {y0 + s}, {x0} {y0}))"
    )
    cx, cy = wkt_centroid(wkt)
    assert abs(cx - (x0 + s / 2)) < 1e-6 * max(1, abs(x0))
    assert abs(cy - (y0 + s / 2)) < 1e-6 * max(1, abs(y0))
    # centroid inside the (convex) polygon bbox
    assert x0 <= cx <= x0 + s and y0 <= cy <= y0 + s


@settings(max_examples=200, deadline=None)
@given(lat, lng)
def test_hex_cell_deterministic_and_wellformed(la, lo):
    c1 = latlng_to_cell(la, lo, 9)
    assert c1 == latlng_to_cell(la, lo, 9)
    assert c1.startswith("hx9_")
    q, r = c1.split("_")[1:]
    int(q), int(r)  # parseable axial coords


@settings(max_examples=100, deadline=None)
@given(lat, lng)
def test_hex_cell_winding_order_irrelevant_for_centroid(la, lo):
    s = 0.01
    ccw = (
        f"POLYGON(({lo} {la}, {lo + s} {la}, {lo + s} {la + s}, "
        f"{lo} {la + s}, {lo} {la}))"
    )
    cw = (
        f"POLYGON(({lo} {la}, {lo} {la + s}, {lo + s} {la + s}, "
        f"{lo + s} {la}, {lo} {la}))"
    )
    a, b = wkt_centroid(ccw), wkt_centroid(cw)
    assert abs(a[0] - b[0]) < 1e-9 and abs(a[1] - b[1]) < 1e-9


# ---------------------------------------------------------------------------
# H3 swap-seam contract (see table in functions/geo.py docstring): the
# properties real h3.latlng_to_cell guarantees and the engine relies on.
# If the real h3 wheel ever lands in the environment, the last test
# runs the same contract against it directly.
# ---------------------------------------------------------------------------

_NYC = (40.7128, -74.0060)


def test_contract_determinism_and_format():
    a = latlng_to_cell(*_NYC, 9)
    b = latlng_to_cell(*_NYC, 9)
    assert a == b
    assert a.startswith("hx9_")
    # Stable across argument float-repr round-trip (process-independent).
    assert latlng_to_cell(float(f"{_NYC[0]!r}"), float(f"{_NYC[1]!r}"), 9) == a


@settings(max_examples=150, deadline=None)
@given(lat, lng)
def test_contract_locality_10m_pairs_mostly_share(y, x):
    # 10 m ≈ 9e-5 deg latitude: far below the ~200 m res-9 cell radius;
    # a pair can straddle a boundary, so assert over a neighborhood
    # batch instead of a single pair (h3 gives the same guarantee shape).
    same = sum(
        latlng_to_cell(y + k * 9e-5, x, 9) == latlng_to_cell(y + k * 9e-5 + 9e-5, x, 9)
        for k in range(10)
    )
    assert same >= 5  # boundaries are measure-zero; typically 9-10/10


@settings(max_examples=150, deadline=None)
@given(lat, lng)
def test_contract_separation_1km_never_shares(y, x):
    # 1 km ≈ 0.009 deg latitude ≫ 2× the res-9 cell diameter — real H3
    # and any correct partition must place these in different cells.
    assert latlng_to_cell(y, x, 9) != latlng_to_cell(y + 0.009, x, 9)


def test_contract_resolution_scaling():
    # Finer resolution ⇒ strictly more distinct cells over a fixed grid.
    pts = [
        (40.70 + i * 0.002, -74.01 + j * 0.002)
        for i in range(10)
        for j in range(10)
    ]
    counts = {
        res: len({latlng_to_cell(la, lo, res) for la, lo in pts})
        for res in (7, 8, 9)
    }
    assert counts[7] < counts[8] < counts[9]
    # res-9 cell scale ≈ 200 m: a ~2 km square of 100 points spread over
    # ~20x20 cells should give mostly-distinct cells.
    assert counts[9] >= 50


def test_contract_res9_cell_extent_under_500m():
    # Walk 2 km north in 20 m steps: the walk must cross several cell
    # boundaries (cells are bounded, ~200-350 m across), i.e. no cell
    # swallows a 500 m stretch.
    cells = [latlng_to_cell(40.70 + k * 1.8e-4, -74.0, 9) for k in range(100)]
    longest_run = max(
        len(list(g)) for _, g in __import__("itertools").groupby(cells)
    )
    assert longest_run * 20 <= 500
    assert len(set(cells)) >= 5


def test_contract_against_real_h3_if_available():
    import pytest

    from taxi_trips_etl_spark.functions import geo

    if not geo.HAS_H3:
        pytest.skip("h3 wheel not in environment (documented swap seam)")
    # Same contract, real library: locality, separation, determinism.
    # Goes through the library's own resolved entry point (v4
    # latlng_to_cell / v3 geo_to_h3), not a hardcoded v4 attribute.
    cell = lambda lat, lng: geo.latlng_to_cell(lat, lng, 9, scheme="h3")  # noqa: E731
    a = cell(*_NYC)
    assert cell(*_NYC) == a
    assert cell(_NYC[0] + 0.009, _NYC[1]) != a

    # Golden seam proof for the full enrichment path: WKT zone →
    # spherical centroid → REAL res-9 id. Expected ids come from the
    # library itself on the independently-computed centroid, so this
    # pins our plumbing (the seam), while the library pins the H3 math.
    from taxi_trips_etl_spark.sources.taxi_testdata import _zone_wkt

    res_fn = getattr(geo._h3lib, "get_resolution", None) or getattr(
        geo._h3lib, "h3_get_resolution", None
    )
    for z in range(10):
        wkt = _zone_wkt(z, detailed=(z % 3 == 0))
        lon, lat = geo.wkt_centroid_spherical(wkt)
        expected = geo._h3_cell_fn(lat, lon, 9)
        got = geo.centroid_cell(wkt, 9, scheme="h3")
        assert got == expected, (z, got, expected)
        if res_fn is not None:
            assert res_fn(got) == 9
