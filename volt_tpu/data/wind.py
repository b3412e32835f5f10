"""NOAA USCRN wind-dataset builder.

Reference ``experiments/weather/make_wind_dataset.ipynb``: scrape the
sub-hourly 2021 USCRN archive, keep stations with complete records
(105120 rows), take column 21 (wind speed), map the ``-99.0`` sentinel to
0, and pickle ``(names, lonlat, data)``.  Network access is gated exactly
like the other ingestion edges (this image has no egress); the parsing
logic is importable and unit-testable without it.
"""

from __future__ import annotations

import pickle

import numpy as np

__all__ = ["parse_uscrn_rows", "build_wind_dataset", "USCRN_BASE_URL"]

USCRN_BASE_URL = (
    "https://www.ncei.noaa.gov/pub/data/uscrn/products/subhourly01/2021/"
)
_EXPECTED_ROWS = 105_120  # 365 days * 288 five-minute rows
_WIND_COL = 21
# USCRN subhourly whitespace tokens: 6 = LONGITUDE, 7 = LATITUDE
# (notebook ``dat.iloc[0, 6] / iloc[0, 7]``; tokens 3/4 are
# LST_DATE/LST_TIME — reading those made the CONUS lon filter a no-op)
_LON_COL, _LAT_COL = 6, 7


def parse_uscrn_rows(lines):
    """Parse one station's raw text rows -> ``(lonlat, wind)`` or ``None``
    if the record is incomplete (the notebook's completeness filter)."""
    rows = [line.split() for line in lines if line.strip()]
    if len(rows) != _EXPECTED_ROWS:
        return None
    lonlat = (float(rows[0][_LON_COL]), float(rows[0][_LAT_COL]))
    wind = np.array([float(r[_WIND_COL]) for r in rows], np.float32)
    wind[wind == -99.0] = 0.0
    return lonlat, wind


def build_wind_dataset(out_path: str = "wind_data.p", year: int = 2021,
                       limit: int | None = None):
    """Scrape + pickle the USCRN wind dataset (requires network access)."""
    try:
        import requests
        from bs4 import BeautifulSoup
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "requests/beautifulsoup4 are not installed; the wind scrape is "
            "an optional data edge (reference make_wind_dataset.ipynb)"
        ) from e

    base = USCRN_BASE_URL.replace("2021", str(year))
    index = requests.get(base, timeout=60)
    soup = BeautifulSoup(index.text, "html.parser")
    files = [a["href"] for a in soup.find_all("a")
             if a.get("href", "").endswith(".txt")]
    if limit is not None:  # limit=0 means "scrape nothing", not "all"
        files = files[:limit]

    names, lonlats, data = {}, [], []
    for i, fname in enumerate(files):
        txt = requests.get(base + fname, timeout=120).text
        parsed = parse_uscrn_rows(txt.splitlines())
        if parsed is None:
            continue
        lonlat, wind = parsed
        # notebook name slice url[17:-4]: strips "CRNS0101-05-YYYY-",
        # yielding e.g. "AK_Cordova_14_ESE" (year prefix removed too)
        names[len(data)] = fname.replace(
            f"CRNS0101-05-{year}-", ""
        ).replace(".txt", "")
        lonlats.append(lonlat)
        data.append(wind)

    with open(out_path, "wb") as fh:
        pickle.dump((names, np.array(lonlats), data), fh)
    return names, np.array(lonlats), data
