"""DuckDB oracle SQL for the level pipeline.

Each oracle re-derives the reference semantics
(/root/reference/pipeline/cosmoz_process_levels.py) independently of
the Spark implementation, on inputs built by the same synth prelude
(domain/synth.py) — so the driver's hash-compare is a genuine
cross-check of two implementations.

Numeric literals are written in E-notation: DuckDB parses ``0.8`` as
DECIMAL (exact) while the Spark engine computes in float64, and e.g.
``count < 0.8*prev_count`` lands exactly on integer boundaries — the
E-form forces identical IEEE double arithmetic in both engines.
Expression trees mirror the Spark builders parenthesis-for-parenthesis
so both sides round identically at 6 decimals.
"""

from __future__ import annotations

from .synth import domain_prelude

# water-vapour formula (cosmoz_process_levels.py:223) — same tree as
# physics.wv_corr_formula
def _wvf(t: str, h: str) -> str:
    return (
        f"(1e0 + 5.4e-3 * ((2.165e3 * ((6.108e-1 * exp((1.727e1 * {t}) / ({t} + 2.373e2)))"
        f" * ({h} / 1e2))) / ({t} + 2.7316e2) - 0e0))"
    )


LEVEL1_CTES: tuple[tuple[str, str], ...] = (
    (
        "l1_lagged",
        """
SELECT r.*,
       lag(count) OVER (PARTITION BY site_no ORDER BY "time") AS prev_count,
       lag("time") OVER (
           PARTITION BY site_no, count, pressure1, internal_temperature,
                        internal_humidity, battery, tube_temperature, tube_humidity,
                        rain, vwc1, vwc2, vwc3, pressure2, external_temperature,
                        external_humidity, flag
           ORDER BY "time") AS prev_same_time
FROM raw_values r
""",
    ),
    (
        "level1",
        """
SELECT "time", site_no,
       CAST(CASE WHEN battery < 10 THEN 4
                 WHEN count < 8e-1 * prev_count OR count > 1.2e0 * prev_count THEN 1
                 ELSE flag END AS INT) AS flag,
       count, pressure1, internal_temperature, internal_humidity, battery,
       tube_temperature, tube_humidity, rain, vwc1, vwc2, vwc3, pressure2,
       external_temperature, external_humidity
FROM l1_lagged
WHERE prev_count IS NOT NULL
  AND NOT (prev_same_time IS NOT NULL AND prev_same_time >= "time" - INTERVAL 29 MINUTE)
""",
    ),
)

LEVEL2_CTES: tuple[tuple[str, str], ...] = LEVEL1_CTES + (
    (
        "l2_hourly",
        """
SELECT site_no, date_trunc('hour', "time") AS hr,
       arg_min(intensity, "time") AS intensity_hour,
       COUNT(*) AS n_hour_rows
FROM intensity GROUP BY 1, 2
""",
    ),
    (
        "l2_silo_pick",
        """
SELECT site_no, CAST("time" AS DATE) AS day,
       arg_max(average_temperature, "time") AS silo_t_raw,
       arg_max(average_humidity, "time") AS silo_h_raw
FROM silo_data WHERE extract(hour FROM "time") < 12 GROUP BY 1, 2
""",
    ),
    (
        "l2_joined",
        """
SELECT b.*, ib.intensity AS intensity_bw, if2.intensity AS intensity_fw
FROM (
    SELECT l.*, h.intensity_hour, h.n_hour_rows, s.silo_t_raw, s.silo_h_raw
    FROM level1 l
    LEFT JOIN l2_hourly h
      ON l.site_no = h.site_no AND date_trunc('hour', l."time") = h.hr
    LEFT JOIN l2_silo_pick s
      ON l.site_no = s.site_no AND CAST(l."time" AS DATE) = s.day
) b
ASOF LEFT JOIN intensity ib ON b.site_no = ib.site_no AND b."time" >= ib."time"
ASOF LEFT JOIN intensity if2 ON b.site_no = if2.site_no AND b."time" <= if2."time"
""",
    ),
    (
        "l2_masked",
        """
SELECT j.*, st.beta, st.ref_pressure, st.ref_intensity, st.latit_scaling, st.elev_scaling,
       CASE WHEN j.external_temperature = 0e0 OR j.external_humidity = 0e0
            THEN j.silo_t_raw END AS silo_t,
       CASE WHEN j.external_temperature = 0e0 OR j.external_humidity = 0e0
            THEN j.silo_h_raw END AS silo_h,
       CASE WHEN j.n_hour_rows IS NOT NULL THEN j.intensity_hour
            ELSE coalesce(j.intensity_bw, j.intensity_fw) END AS use_int
FROM l2_joined j JOIN all_stations st ON j.site_no = st.site_no
""",
    ),
    (
        "l2_corr",
        f"""
SELECT "time", site_no, flag, count, rain, latit_scaling, elev_scaling,
       CASE WHEN pressure2 <> 0 THEN exp(beta * (pressure2 - ref_pressure))
            WHEN pressure1 <> 0 THEN exp(beta * (pressure1 - ref_pressure))
            ELSE 1e0 END AS press_corr,
       CASE WHEN external_temperature <> 0 AND external_humidity <> 0
                THEN {_wvf("external_temperature", "external_humidity")}
            WHEN silo_h IS NOT NULL
                THEN {_wvf("coalesce(silo_t, 0e0)", "silo_h")}
            WHEN external_humidity <> 0
                THEN {_wvf("0e0", "external_humidity")}
            ELSE 1e0 END AS wv_corr,
       CASE WHEN use_int IS NULL OR use_int = 0e0 THEN 1e0
            ELSE use_int / ref_intensity END AS intensity_corr
FROM l2_masked
""",
    ),
    (
        "level2",
        """
SELECT "time", site_no, flag, count, press_corr, wv_corr, intensity_corr,
       (count * wv_corr * press_corr / intensity_corr) / (latit_scaling / elev_scaling)
           AS corr_count,
       rain
FROM l2_corr
""",
    ),
)

LEVEL3_CTES: tuple[tuple[str, str], ...] = LEVEL2_CTES + (
    (
        "l3_base",
        """
SELECT l2.*, st.n0_cal, st.bulk_density,
       (st.lattice_water_g_g + st.soil_organic_matter_g_g) AS lat_org_sum,
       coalesce(st.alternate_algorithm = 'sandy', false) AS sandy
FROM level2 l2 JOIN all_stations st ON l2.site_no = st.site_no
""",
    ),
    (
        "l3_moist",
        """
SELECT *, CASE WHEN sandy THEN 1.21603643e9 * power(corr_count, -3.272e0)
               ELSE (8.08e-2 / ((corr_count / n0_cal) - 3.72e-1) - 1.15e-1 - lat_org_sum)
                    * bulk_density
          END AS corrected
FROM l3_base
""",
    ),
    (
        "level3",
        """
SELECT "time", site_no,
       CAST(CASE WHEN wv_corr = 1e0 THEN 5
                 WHEN corr_count > (CASE WHEN sandy THEN 3e0 * n0_cal ELSE n0_cal END) THEN 3
                 WHEN corr_count < (CASE WHEN sandy THEN 5e-1 * n0_cal ELSE 4e-1 * n0_cal END) THEN 2
                 ELSE flag END AS INT) AS flag,
       corrected * 1e2 AS soil_moist,
       5.8e0 / ((lat_org_sum * bulk_density) + corrected + 8.29e-2) AS effective_depth,
       rain * 2e-1 AS rainfall
FROM l3_moist
""",
    ),
)

LEVEL4_CTES: tuple[tuple[str, str], ...] = LEVEL3_CTES + (
    ("l4_valid", 'SELECT * FROM level3 WHERE flag = 0'),
    (
        "l4_windowed",
        """
SELECT v.*,
       list_slice(list(soil_moist) OVER win, 1, 7) AS sm_l,
       list_slice(list(effective_depth) OVER win, 1, 7) AS ed_l
FROM l4_valid v
WINDOW win AS (PARTITION BY site_no ORDER BY "time"
               RANGE BETWEEN INTERVAL 10801 SECOND PRECEDING
                         AND INTERVAL 10801 SECOND FOLLOWING)
""",
    ),
    (
        "level4",
        """
SELECT "time", site_no, soil_moist, effective_depth, rainfall,
       CASE WHEN len(sm_l) > 0 THEN list_aggregate(sm_l, 'sum') / len(sm_l)
            ELSE soil_moist END AS soil_moist_filtered,
       CASE WHEN len(ed_l) > 0 THEN list_aggregate(ed_l, 'sum') / len(ed_l)
            ELSE effective_depth END AS depth_filtered
FROM l4_windowed
""",
    ),
)


def _q(ctes: tuple[tuple[str, str], ...], select: str) -> str:
    return f"{domain_prelude(*ctes)}\n{select}"


# final projections: timestamps as ISO strings (engine/oracle timestamp
# canonicalization differs), derived doubles rounded to 6 so that ≤1-ulp
# libm (exp/pow) differences cannot flip the driver's value hash
LEVEL1_ORACLE = _q(
    LEVEL1_CTES,
    """
SELECT strftime("time", '%Y-%m-%d %H:%M:%S') AS time, site_no, flag, count,
       pressure1, internal_temperature, internal_humidity, battery, tube_temperature,
       tube_humidity, rain, vwc1, vwc2, vwc3, pressure2, external_temperature,
       external_humidity
FROM level1
""",
)

LEVEL2_ORACLE = _q(
    LEVEL2_CTES,
    """
SELECT strftime("time", '%Y-%m-%d %H:%M:%S') AS time, site_no, flag, count,
       round(press_corr, 6) AS press_corr, round(wv_corr, 6) AS wv_corr,
       round(intensity_corr, 6) AS intensity_corr, round(corr_count, 6) AS corr_count,
       rain
FROM level2
""",
)

LEVEL3_ORACLE = _q(
    LEVEL3_CTES,
    """
SELECT strftime("time", '%Y-%m-%d %H:%M:%S') AS time, site_no, flag,
       round(soil_moist, 6) AS soil_moist, round(effective_depth, 6) AS effective_depth,
       round(rainfall, 6) AS rainfall
FROM level3
""",
)

LEVEL4_ORACLE = _q(
    LEVEL4_CTES,
    """
SELECT strftime("time", '%Y-%m-%d %H:%M:%S') AS time, site_no,
       round(soil_moist, 6) AS soil_moist, round(effective_depth, 6) AS effective_depth,
       round(rainfall, 6) AS rainfall, round(soil_moist_filtered, 6) AS soil_moist_filtered,
       round(depth_filtered, 6) AS depth_filtered
FROM level4
""",
)

# SQL-spec mode (SURVEY §7.3): the view's installation-date filter
# (level3->level4.sql:63-64) restored on the output rows; the moving
# average still runs over the unfiltered flag-0 set, as the SQL UDFs
# query Level3View which carries no installation filter (:51-61)
LEVEL4_SPEC_ORACLE = _q(
    LEVEL4_CTES,
    """
SELECT strftime(l4."time", '%Y-%m-%d %H:%M:%S') AS time, l4.site_no,
       round(l4.soil_moist, 6) AS soil_moist,
       round(l4.effective_depth, 6) AS effective_depth,
       round(l4.rainfall, 6) AS rainfall,
       round(l4.soil_moist_filtered, 6) AS soil_moist_filtered,
       round(l4.depth_filtered, 6) AS depth_filtered
FROM level4 l4 JOIN all_stations st ON l4.site_no = st.site_no
WHERE l4."time" >= st.installation_date
""",
)
