"""Physics / correction expression library (SURVEY §2.8 F1–F12).

Pure-Catalyst column builders — zero Python UDFs, so every expression
stays inside whole-stage codegen and vectorizes on the JVM. Each
function mirrors a formula in the reference, cited by file:line into
/root/reference/.

All arithmetic is DoubleType: the reference converts its Decimal128
calibration constants to float64 before use
(pipeline/cosmoz_process_levels.py:125-128, 195, 283, 286-287), so
double matches deployed numerics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SANDY_A = 1216036430.0  # cosmoz_process_levels.py:110
SANDY_B = -3.272  # cosmoz_process_levels.py:111


def press_corr(pressure1: Column, pressure2: Column, beta: Column, ref_pressure: Column) -> Column:
    """Barometric correction factor (F1, F9).

    pressure2 preferred, pressure1 fallback, 1.0 when both zero —
    cosmoz_process_levels.py:194-199; derivation level1->level2.sql:60.
    """
    return (
        F.when(pressure2 != 0, F.exp(beta * (pressure2 - ref_pressure)))
        .when(pressure1 != 0, F.exp(beta * (pressure1 - ref_pressure)))
        .otherwise(F.lit(1.0))
    )


def wv_corr_formula(temperature: Column, humidity: Column) -> Column:
    """Water-vapour correction for a (T °C, RH %) pair (F1, F3).

    1 + 0.0054 * ((2165 * (satVP(T) * RH/100)) / (T + 273.16) − 0)
    with satVP(T) = 0.6108 * exp(17.27·T / (T + 237.3)) —
    cosmoz_process_levels.py:223; derivation level1->level2.sql:47-74.
    """
    sat_vp = 0.6108 * F.exp((17.27 * temperature) / (temperature + 237.3))
    return 1 + 0.0054 * ((2165 * (sat_vp * (humidity / 100.0))) / (temperature + 273.16) - 0)


def wv_corr(
    external_temperature: Column,
    external_humidity: Column,
    silo_temperature: Column,
    silo_humidity: Column,
) -> Column:
    """Full water-vapour fallback ladder (F3, F9).

    Reference control flow, cosmoz_process_levels.py:221-249 with
    emulate_old_version=False (deployed default, :172):
      1. both externals valid (≠0)      → formula(ext_t, ext_h)
      2. SILO day row found (queried only when an external is 0) and
         its humidity parses             → formula(silo_t or 0, silo_h)
      3. else use ext_h if ≠0 (ext_t must be 0 here; SILO missing →
         temp falls back to 0.0)         → formula(0, ext_h)
      4. else                            → 1.0
    Callers pass ``silo_*`` already masked to NULL unless the SILO
    lookup would have fired (ext_t = 0 OR ext_h = 0).
    """
    return (
        F.when(
            (external_temperature != 0) & (external_humidity != 0),
            wv_corr_formula(external_temperature, external_humidity),
        )
        .when(
            silo_humidity.isNotNull(),
            wv_corr_formula(F.coalesce(silo_temperature, F.lit(0.0)), silo_humidity),
        )
        .when(external_humidity != 0, wv_corr_formula(F.lit(0.0), external_humidity))
        .otherwise(F.lit(1.0))
    )


def intensity_corr(intensity: Column, ref_intensity: Column) -> Column:
    """Incoming-radiation correction (F9, F10).

    NULL (no intensity found anywhere) or exactly 0.0 (div-zero guard)
    → 1.0; else intensity / ref — cosmoz_process_levels.py:278-285.
    """
    return (
        F.when(intensity.isNull() | (intensity == 0.0), F.lit(1.0))
        .otherwise(intensity / ref_intensity)
    )


def corr_count(
    count: Column,
    wv_corr_use: Column,
    press_corr_col: Column,
    intensity_corr_col: Column,
    latit_scaling: Column,
    elev_scaling: Column,
) -> Column:
    """Fully corrected neutron count (F4) —
    cosmoz_process_levels.py:289; level1->level2.sql:63."""
    return (count * wv_corr_use * press_corr_col / intensity_corr_col) / (
        latit_scaling / elev_scaling
    )


def corrected_moist(corr_count_col: Column, n0_cal: Column, lattice_organic_sum: Column,
                    bulk_density: Column, sandy: Column) -> Column:
    """Volumetric moisture before ×100 (F2, F5) — default algorithm
    cosmoz_process_levels.py:149, sandy variant :139."""
    default = (
        0.0808 / ((corr_count_col / n0_cal) - 0.372) - 0.115 - lattice_organic_sum
    ) * bulk_density
    sandy_val = SANDY_A * F.pow(corr_count_col, F.lit(SANDY_B))
    return F.when(sandy, sandy_val).otherwise(default)


def soil_moist(corrected_moist_col: Column) -> Column:
    """Soil moisture %vol (F5) — cosmoz_process_levels.py:151."""
    return corrected_moist_col * 100.0


def effective_depth(corrected_moist_col: Column, lattice_organic_sum: Column,
                    bulk_density: Column) -> Column:
    """Sensing depth in cm (F6) — cosmoz_process_levels.py:153;
    level2->level3.sql:41."""
    return 5.8 / ((lattice_organic_sum * bulk_density) + corrected_moist_col + 0.0829)


def rainfall(rain: Column) -> Column:
    """Tipping-bucket count → mm, 0.2 mm per tip (F7) —
    cosmoz_process_levels.py:165."""
    return rain * 0.2


def level1_flag(battery: Column, count: Column, prev_count: Column, raw_flag: Column) -> Column:
    """Level-1 QC flag ladder (F8) — cosmoz_process_levels.py:397-402;
    raw->level1.sql:88-96. battery < 10 → 4; count outside ±20 % of
    previous → 1; else carry the raw flag."""
    return (
        F.when(battery < 10, F.lit(4))
        .when((count < 0.8 * prev_count) | (count > 1.2 * prev_count), F.lit(1))
        .otherwise(raw_flag)
    ).cast("int")


def level3_flag(wv_corr_col: Column, corr_count_col: Column, n0_cal: Column,
                level2_flag: Column, sandy: Column) -> Column:
    """Level-3 QC flag ladder (F8) — cosmoz_process_levels.py:130-148;
    level2->level3.sql:72-81. wv_corr == 1.0 → 5; corr_count above /
    below N0 thresholds → 3 / 2 (sandy uses 3×N0 / 0.5×N0); else carry.
    """
    hi = F.when(sandy, 3.0 * n0_cal).otherwise(n0_cal)
    lo = F.when(sandy, 0.5 * n0_cal).otherwise(0.4 * n0_cal)
    return (
        F.when(wv_corr_col == 1.0, F.lit(5))
        .when(corr_count_col > hi, F.lit(3))
        .when(corr_count_col < lo, F.lit(2))
        .otherwise(level2_flag)
    ).cast("int")
