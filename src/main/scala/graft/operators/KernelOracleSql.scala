package graft.operators

/** DuckDB oracle SQL for the curve-kernel features (q37/q50): a faithful
  * SQL re-derivation of `Kernels.ekviPaa`+`fixMissing` (abbe, density),
  * `Kernels.variogram`+`lsqSlope` (variogram slope) and `Sax.toLetterRep`
  * (SAX word), matching the Scala kernels to < 1e-9 so the rounded (6 dp)
  * outputs hash-match.
  *
  * Notable replication details, mirrored expression-for-expression:
  *   - ekvi-PAA borders `lo + i*(hi-lo)/b` with the half-open `[b_i, b_{i+1})`
  *     membership test (`data_analysis.py:54-140` semantics);
  *   - empty bins take the border midpoint for x and interpolate y with the
  *     reference's distance-PROPORTIONAL weights — the sequential left-to-right
  *     gap fill is a recursive CTE stepping one position per iteration
  *     (`data_analysis.py:354-412`);
  *   - PAA frame starts `trunc(k * n/bins)` while `start <= n - ceil(n/bins)`
  *     (`data_analysis.py:14-51`), applied three times (t/v reduce, pair
  *     reduce, SAX word);
  *   - variogram pairs are ordered i≠j with a STABLE sort by distance
  *     (`ORDER BY vx, i, j` = numpy argsort tie order by generation index);
  *   - `computeBins` uses banker's rounding (math.rint) — the `= 0.5` CASE
  *     arm reproduces ties-to-even exactly;
  *   - SAX breakpoints for alphabet 10 inlined from `sax.py:203-233`.
  */
object KernelOracleSql {

  /** Shared CTE block: per-user curves (`pts`/`u`), abbe via ekvi-PAA(50)
    * (`eabbe`), curve density via the ekvi-PAA(n) x-grid (`dens`), and the
    * variogram slope (`vslope`). Callers prepend WITH RECURSIVE.
    */
  val kernelCtes: String =
    """pts AS (
      |  SELECT user_id, epoch_ns(ts)/86400e9 AS t, value AS v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)/86400e9, value) AS pos
      |  FROM events),
      |u AS (
      |  SELECT user_id, count(*) AS n, min(t) AS tmin, max(t) AS tmax
      |  FROM pts GROUP BY 1 HAVING count(*) > 10),
      |eb AS (
      |  SELECT user_id, n, tmin, tmax, least(50, n) AS b,
      |    (tmax - tmin) / least(50, n) / 2.0 AS h
      |  FROM u),
      |ebins AS (
      |  SELECT e.user_id, gs.i,
      |    (e.tmin - e.h) + gs.i * ((e.tmax + e.h) - (e.tmin - e.h)) / e.b AS b_lo,
      |    (e.tmin - e.h) + (gs.i + 1) * ((e.tmax + e.h) - (e.tmin - e.h)) / e.b AS b_hi
      |  FROM eb e, LATERAL (SELECT unnest(generate_series(0, e.b - 1)) AS i) gs),
      |exa AS (
      |  SELECT eb2.user_id, eb2.i,
      |    CASE WHEN count(p.t) > 0 THEN sum(p.t) / count(p.t)
      |         ELSE (eb2.b_hi + eb2.b_lo) / 2 END AS xa,
      |    CASE WHEN count(p.t) > 0 THEN sum(p.v) / count(p.t) END AS ya
      |  FROM ebins eb2 LEFT JOIN pts p
      |    ON p.user_id = eb2.user_id AND p.t >= eb2.b_lo AND p.t < eb2.b_hi
      |  GROUP BY eb2.user_id, eb2.i, eb2.b_lo, eb2.b_hi),
      |erep AS (
      |  SELECT user_id, i, xa,
      |    CASE WHEN ya IS NOT NULL THEN ya
      |         WHEN i < fv THEN yfv WHEN i > lv THEN ylv END AS ya
      |  FROM (
      |    SELECT user_id, i, xa, ya,
      |      min(CASE WHEN ya IS NOT NULL THEN i END) OVER (PARTITION BY user_id) AS fv,
      |      max(CASE WHEN ya IS NOT NULL THEN i END) OVER (PARTITION BY user_id) AS lv,
      |      first_value(ya IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY i
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS yfv,
      |      last_value(ya IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY i
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ylv
      |    FROM exa)),
      |egap AS (
      |  SELECT g.user_id, g.i, g.xa, r.xa AS xr, r.ya AS yb
      |  FROM (
      |    SELECT user_id, i, xa, ya,
      |      min(CASE WHEN ya IS NOT NULL THEN i END) OVER (PARTITION BY user_id
      |        ORDER BY i ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ri
      |    FROM erep QUALIFY ya IS NULL) g
      |  JOIN erep r ON r.user_id = g.user_id AND r.i = g.ri),
      |efill AS (
      |  SELECT user_id, i, xa, ya FROM erep WHERE ya IS NOT NULL
      |  UNION ALL
      |  SELECT g.user_id, g.i, g.xa,
      |    ((g.xa - p.xa) / ((g.xa - p.xa) + (g.xr - g.xa))) * p.ya
      |      + ((g.xr - g.xa) / ((g.xa - p.xa) + (g.xr - g.xa))) * g.yb
      |  FROM efill p JOIN egap g ON g.user_id = p.user_id AND g.i = p.i + 1),
      |eabbe AS (
      |  SELECT d.user_id,
      |    u.n / (2.0 * (u.n - 1.0)) * d.sum1 / c.sum2 AS abbe
      |  FROM (SELECT user_id, sum((ya - yp) * (ya - yp)) AS sum1
      |        FROM (SELECT user_id, ya,
      |                lag(ya) OVER (PARTITION BY user_id ORDER BY i) AS yp
      |              FROM efill) GROUP BY 1) d
      |  JOIN (SELECT f.user_id, sum((f.ya - a.mn) * (f.ya - a.mn)) AS sum2
      |        FROM efill f JOIN (SELECT user_id, sum(ya) / count(*) AS mn
      |                           FROM efill GROUP BY 1) a USING (user_id)
      |        GROUP BY 1) c USING (user_id)
      |  JOIN u USING (user_id)),
      |dbins AS (
      |  SELECT e.user_id, gs.i,
      |    (e.tmin - e.h) + gs.i * ((e.tmax + e.h) - (e.tmin - e.h)) / e.n AS b_lo,
      |    (e.tmin - e.h) + (gs.i + 1) * ((e.tmax + e.h) - (e.tmin - e.h)) / e.n AS b_hi
      |  FROM (SELECT user_id, n, tmin, tmax, (tmax - tmin) / n / 2.0 AS h FROM u) e,
      |    LATERAL (SELECT unnest(generate_series(0, e.n - 1)) AS i) gs),
      |dens AS (
      |  SELECT user_id, count(*) / (max(xa) - min(xa)) AS density
      |  FROM (
      |    SELECT db.user_id, db.i,
      |      CASE WHEN count(p.t) > 0 THEN sum(p.t) / count(p.t)
      |           ELSE (db.b_hi + db.b_lo) / 2 END AS xa
      |    FROM dbins db LEFT JOIN pts p
      |      ON p.user_id = db.user_id AND p.t >= db.b_lo AND p.t < db.b_hi
      |    GROUP BY db.user_id, db.i, db.b_lo, db.b_hi)
      |  GROUP BY 1),
      |vb AS (
      |  SELECT user_id, n, greatest(5, CAST(
      |    CASE WHEN (tmax - tmin) - floor(tmax - tmin) = 0.5
      |         THEN 2.0 * round((tmax - tmin) / 2.0)
      |         ELSE round(tmax - tmin) END AS INT)) AS b
      |  FROM u),
      |vfr AS (
      |  SELECT s.user_id, gs.k,
      |    CAST(trunc(gs.k * (s.n / CAST(s.b AS DOUBLE))) AS INT) AS fstart, s.step
      |  FROM (SELECT user_id, n, b, CAST(ceil(n / CAST(b AS DOUBLE)) AS INT) AS step
      |        FROM vb) s,
      |    LATERAL (SELECT unnest(generate_series(0, 2 * s.b + 2)) AS k) gs
      |  WHERE CAST(trunc(gs.k * (s.n / CAST(s.b AS DOUBLE))) AS INT) <= s.n - s.step),
      |vpaa AS (
      |  SELECT f.user_id, f.k, sum(p.t) / count(*) AS xr, sum(p.v) / count(*) AS yr
      |  FROM vfr f JOIN pts p ON p.user_id = f.user_id
      |    AND p.pos BETWEEN f.fstart + 1 AND f.fstart + f.step
      |  GROUP BY 1, 2),
      |vsorted AS (
      |  SELECT user_id, vx, vy,
      |    row_number() OVER (PARTITION BY user_id ORDER BY vx, i, j) AS pos,
      |    count(*) OVER (PARTITION BY user_id) AS m
      |  FROM (
      |    SELECT a.user_id, a.k AS i, b2.k AS j,
      |      abs(a.xr - b2.xr) AS vx, (a.yr - b2.yr) * (a.yr - b2.yr) AS vy
      |    FROM vpaa a JOIN vpaa b2 ON a.user_id = b2.user_id AND a.k != b2.k)),
      |v2fr AS (
      |  SELECT s.user_id, gs.k,
      |    CAST(trunc(gs.k * (s.m / CAST(s.b AS DOUBLE))) AS INT) AS fstart, s.step2
      |  FROM (SELECT v.user_id, v.m, w.b,
      |          CAST(ceil(v.m / CAST(w.b AS DOUBLE)) AS INT) AS step2
      |        FROM (SELECT user_id, max(m) AS m FROM vsorted GROUP BY 1) v
      |        JOIN vb w USING (user_id)) s,
      |    LATERAL (SELECT unnest(generate_series(0, 2 * s.b + 2)) AS k) gs
      |  WHERE CAST(trunc(gs.k * (s.m / CAST(s.b AS DOUBLE))) AS INT) <= s.m - s.step2),
      |vslope AS (
      |  SELECT user_id,
      |    (count(*) * sum(lx * ly) - sum(lx) * sum(ly)) /
      |    (count(*) * sum(lx * lx) - sum(lx) * sum(lx)) AS vario_slope
      |  FROM (
      |    SELECT q.user_id, log10(q.rx) AS lx, log10(q.ry) AS ly
      |    FROM (
      |      SELECT f.user_id, f.k, sum(s.vx) / count(*) AS rx, sum(s.vy) / count(*) AS ry
      |      FROM v2fr f JOIN vsorted s ON s.user_id = f.user_id
      |        AND s.pos BETWEEN f.fstart + 1 AND f.fstart + f.step2
      |      GROUP BY 1, 2) q)
      |  GROUP BY 1)""".stripMargin

  /** SAX word CTEs (z-norm → PAA(8) → alphabet-10 letters), appended after
    * [[kernelCtes]].
    */
  val saxCtes: String =
    """snorm AS (
      |  SELECT p.user_id, p.pos, u.n,
      |    CASE WHEN st.sd < 1e-6 THEN 0.0 ELSE (p.v - st.mv) / st.sd END AS nv
      |  FROM pts p
      |  JOIN (SELECT p2.user_id, m.mv,
      |          sqrt(sum((p2.v - m.mv) * (p2.v - m.mv)) / count(*)) AS sd
      |        FROM pts p2 JOIN (SELECT user_id, sum(v) / count(*) AS mv
      |                          FROM pts GROUP BY 1) m USING (user_id)
      |        GROUP BY p2.user_id, m.mv) st ON st.user_id = p.user_id
      |  JOIN u ON u.user_id = p.user_id),
      |xfr AS (
      |  SELECT s.user_id, gs.k,
      |    CAST(trunc(gs.k * (s.n / 8.0)) AS INT) AS fstart, s.step
      |  FROM (SELECT user_id, n, CAST(ceil(n / 8.0) AS INT) AS step FROM u) s,
      |    LATERAL (SELECT unnest(generate_series(0, 18)) AS k) gs
      |  WHERE CAST(trunc(gs.k * (s.n / 8.0)) AS INT) <= s.n - s.step),
      |sword AS (
      |  SELECT user_id, string_agg(
      |    CASE WHEN pv < -1.28 THEN 'a' WHEN pv < -0.84 THEN 'b'
      |         WHEN pv < -0.52 THEN 'c' WHEN pv < -0.25 THEN 'd'
      |         WHEN pv < 0 THEN 'e' WHEN pv < 0.25 THEN 'f'
      |         WHEN pv < 0.52 THEN 'g' WHEN pv < 0.84 THEN 'h'
      |         WHEN pv < 1.28 THEN 'i' ELSE 'j' END, '' ORDER BY k) AS sax_word
      |  FROM (
      |    SELECT f.user_id, f.k, sum(s.nv) / count(*) AS pv
      |    FROM xfr f JOIN snorm s ON s.user_id = f.user_id
      |      AND s.pos BETWEEN f.fstart + 1 AND f.fstart + f.step
      |    GROUP BY 1, 2)
      |  GROUP BY 1)""".stripMargin

  val q37Sql: String =
    s"""WITH RECURSIVE $kernelCtes, $saxCtes
       |SELECT u.user_id, round(e.abbe, 6) AS abbe, w.sax_word,
       |  round(v.vario_slope, 6) AS vario_slope, round(d.density, 6) AS density
       |FROM u JOIN eabbe e USING (user_id) JOIN sword w USING (user_id)
       |JOIN vslope v USING (user_id) JOIN dens d USING (user_id)""".stripMargin

  val q50Sql: String =
    s"""WITH RECURSIVE $kernelCtes,
       |skk AS (
       |  SELECT p.user_id,
       |    (sum(pow(p.v - m.mv, 3)) / count(*)) /
       |      pow(sum(pow(p.v - m.mv, 2)) / count(*), 1.5) AS skewness,
       |    (sum(pow(p.v - m.mv, 4)) / count(*)) /
       |      pow(sum(pow(p.v - m.mv, 2)) / count(*), 2.0) - 3.0 AS kurtosis
       |  FROM pts p JOIN (SELECT user_id, sum(v) / count(*) AS mv FROM pts GROUP BY 1) m
       |    USING (user_id)
       |  GROUP BY 1)
       |SELECT 'user_' || u.user_id AS starId, round(e.abbe, 6) AS abbe_value,
       |  round(k.skewness, 6) AS skewness, round(k.kurtosis, 6) AS kurtosis,
       |  round(d.density, 6) AS curve_density, round(v.vario_slope, 6) AS variogram_slope
       |FROM u JOIN eabbe e USING (user_id) JOIN skk k USING (user_id)
       |JOIN vslope v USING (user_id) JOIN dens d USING (user_id)""".stripMargin
}
