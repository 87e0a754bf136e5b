"""S7 fetch-half unit tests: the reference's [start-1h, end+2h] URL
window (/root/reference/nmdb/data_getter.py:47-72), the file:// hourly
archive stepping, and the composed fetch→parse→validate pipeline."""

from __future__ import annotations

import os
from datetime import datetime

from cosmoz_data_pipeline_spark.sources.nmdb import (
    build_nest_url,
    fetch_nmdb_lines,
    nmdb_fetch_window,
    nmdb_ingest,
)

PREAMBLE = "# NEST\nRCORR_E   start_date_time;value\n"


def test_window_is_minus1h_floor_plus2h():
    s, e = nmdb_fetch_window(datetime(2024, 1, 5, 6, 30), datetime(2024, 1, 5, 18, 10))
    assert s == datetime(2024, 1, 5, 5, 0)
    assert e == datetime(2024, 1, 5, 20, 0)


def test_window_crosses_day_boundaries():
    s, e = nmdb_fetch_window(datetime(2024, 1, 1, 0, 20), datetime(2024, 1, 1, 23, 5))
    assert s == datetime(2023, 12, 31, 23, 0)
    assert e == datetime(2024, 1, 2, 1, 0)


def test_nest_url_fields_match_reference():
    url = build_nest_url("JUNG", datetime(2024, 1, 5, 6, 30), datetime(2024, 1, 5, 18, 10))
    for frag in (
        "stations%5B%5D=JUNG",
        "start_day=5", "start_month=1", "start_year=2024",
        "start_hour=5", "start_min=00",
        "end_day=5", "end_hour=20", "end_min=59",
        "tresolution=60", "output=ascii", "tabchoice=revori",
        "dtype=corr_for_efficiency",
    ):
        assert frag in url, frag


def _write_hour(root: str, station: str, tag: str, line: str) -> None:
    d = os.path.join(root, station)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{tag}.txt"), "w") as f:
        f.write(PREAMBLE + line + "\n")


def test_file_archive_fetch_honors_window_and_skips_missing(tmp_path):
    root = str(tmp_path)
    # hours 04 (outside), 05, 07 (06 missing), 20, 21 (outside)
    for hour, val in [(4, "99.0"), (5, "1.0"), (7, "2.0"), (20, "3.0"), (21, "88.0")]:
        _write_hour(root, "JUNG", f"20240105{hour:02d}", f"2024-01-05 {hour:02d}:00:00;{val}")
    lines = fetch_nmdb_lines(
        "JUNG", datetime(2024, 1, 5, 6, 0), datetime(2024, 1, 5, 18, 0),
        base_url="file://" + root,
    )
    data = [ln for ln in lines if ";" in ln and not ln.startswith(("#", "RCORR"))]
    # 04 and 21 are on disk but OUTSIDE [05:00, 20:59] — must not be read
    assert data == [
        "2024-01-05 05:00:00;1.0",
        "2024-01-05 07:00:00;2.0",
        "2024-01-05 20:00:00;3.0",
    ]


def test_ingest_parses_validates_and_drops_null_markers(spark, tmp_path):
    root = str(tmp_path)
    rows = [
        (5, "100.0"),    # first row: valid
        (6, "110.0"),    # +10% of last valid: valid
        (7, "   null"),  # null marker: dropped before validity
        (8, "200.0"),    # +82% of 110: invalid, last_valid stays 110
        (9, "120.0"),    # within ±20% of 110: valid
    ]
    for hour, val in rows:
        _write_hour(root, "JUNG", f"20240105{hour:02d}", f"2024-01-05 {hour:02d}:00:00;{val}")
    out = nmdb_ingest(
        spark, ["JUNG"], datetime(2024, 1, 5, 6, 0), datetime(2024, 1, 5, 18, 0),
        base_url="file://" + root,
    ).orderBy("ts").collect()
    assert [(r.intensity, r.valid, r.last_valid) for r in out] == [
        (100.0, True, 100.0),
        (110.0, True, 110.0),
        (200.0, False, 110.0),
        (120.0, True, 120.0),
    ]
