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
