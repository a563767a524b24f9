"""Geo lookup fixtures: city→state, state→longitude, longitude-tercile regions.

The reference builds these maps at startup by scraping craigslist's sites
page and geocoding via Nominatim (geospatial/prioritizer.py:15-105 — see
SURVEY.md M15/T6). No network exists here, so the maps are fixed public
geography baked in as data. The *semantics* are preserved exactly:

- ``CITY_TO_STATE``: craigslist-subdomain city token → US state.
- ``STATE_LONGITUDE``: approximate state centroid longitude.
- ``compute_regions()``: sort the 50 states by longitude, pivot = len//3,
  region = min(index // pivot, 2) — the reference's tercile rule
  (prioritizer.py:103-105).

These are broadcast small-side lookup tables: captured once in the priority
UDF (driver-side dict → closure), never shuffled (SURVEY.md J1).
"""

from __future__ import annotations

US_STATES = [
    "Alabama", "Alaska", "Arizona", "Arkansas", "California", "Colorado",
    "Connecticut", "Delaware", "Florida", "Georgia", "Hawaii", "Idaho",
    "Illinois", "Indiana", "Iowa", "Kansas", "Kentucky", "Louisiana",
    "Maine", "Maryland", "Massachusetts", "Michigan", "Minnesota",
    "Mississippi", "Missouri", "Montana", "Nebraska", "Nevada",
    "New Hampshire", "New Jersey", "New Mexico", "New York",
    "North Carolina", "North Dakota", "Ohio", "Oklahoma", "Oregon",
    "Pennsylvania", "Rhode Island", "South Carolina", "South Dakota",
    "Tennessee", "Texas", "Utah", "Vermont", "Virginia", "Washington",
    "West Virginia", "Wisconsin", "Wyoming",
]

STATE_LONGITUDE = {
    "Alabama": -86.8, "Alaska": -152.0, "Arizona": -111.7, "Arkansas": -92.4,
    "California": -119.4, "Colorado": -105.5, "Connecticut": -72.7,
    "Delaware": -75.5, "Florida": -81.7, "Georgia": -83.4, "Hawaii": -157.5,
    "Idaho": -114.6, "Illinois": -89.3, "Indiana": -86.3, "Iowa": -93.5,
    "Kansas": -98.4, "Kentucky": -84.9, "Louisiana": -92.0, "Maine": -69.2,
    "Maryland": -76.8, "Massachusetts": -71.8, "Michigan": -84.6,
    "Minnesota": -94.3, "Mississippi": -89.7, "Missouri": -92.6,
    "Montana": -109.6, "Nebraska": -99.8, "Nevada": -116.6,
    "New Hampshire": -71.6, "New Jersey": -74.5, "New Mexico": -106.1,
    "New York": -75.5, "North Carolina": -79.4, "North Dakota": -100.5,
    "Ohio": -82.8, "Oklahoma": -97.5, "Oregon": -120.6,
    "Pennsylvania": -77.8, "Rhode Island": -71.5, "South Carolina": -80.9,
    "South Dakota": -100.2, "Tennessee": -86.3, "Texas": -99.3,
    "Utah": -111.7, "Vermont": -72.7, "Virginia": -78.8,
    "Washington": -120.4, "West Virginia": -80.6, "Wisconsin": -89.9,
    "Wyoming": -107.6,
}

# 30 craigslist-style city subdomains (FIXTURES.md F1)
CITY_TO_STATE = {
    "newyork": "New York", "brooklyn": "New York",
    "losangeles": "California", "sfbay": "California",
    "sandiego": "California", "sacramento": "California",
    "chicago": "Illinois", "houston": "Texas", "dallas": "Texas",
    "austin": "Texas", "sanantonio": "Texas", "phoenix": "Arizona",
    "philadelphia": "Pennsylvania", "seattle": "Washington",
    "portland": "Oregon", "denver": "Colorado", "boston": "Massachusetts",
    "miami": "Florida", "orlando": "Florida", "tampa": "Florida",
    "atlanta": "Georgia", "detroit": "Michigan", "minneapolis": "Minnesota",
    "stlouis": "Missouri", "kansascity": "Missouri", "lasvegas": "Nevada",
    "charlotte": "North Carolina", "raleigh": "North Carolina",
    "nashville": "Tennessee", "neworleans": "Louisiana",
}

CITIES = sorted(CITY_TO_STATE)


def city_list(n: int) -> list[str]:
    """First ``n`` deterministic city tokens; beyond the 30 base cities,
    derived suburbs ``{city}2``, ``{city}3``… mapped to the same state."""
    out = list(CITIES)
    k = 2
    while len(out) < n:
        out.extend(f"{c}{k}" for c in CITIES)
        k += 1
    return out[:n]


def city_state_map(n: int) -> dict[str, str]:
    """city token → state for ``city_list(n)`` (broadcast to priority UDFs)."""
    base = dict(CITY_TO_STATE)
    for c in city_list(n):
        if c not in base:
            root = c.rstrip("0123456789")
            base[c] = CITY_TO_STATE[root]
    return base


def compute_regions() -> dict[str, int]:
    """state → region ∈ {0,1,2} by longitude tercile (reference rule)."""
    ordered = sorted(US_STATES, key=lambda s: STATE_LONGITUDE[s])
    pivot = len(ordered) // 3
    return {s: min(i // pivot, 2) for i, s in enumerate(ordered)}


STATE_REGION = compute_regions()


def city_region(city: str) -> int | None:
    """city token → region, None if unknown (→ priority −1 upstream)."""
    state = CITY_TO_STATE.get(city)
    if state is None:
        return None
    return STATE_REGION[state]
