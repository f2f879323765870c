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
      |    CASE WHEN count(p.t) > 0
      |         THEN list_sum(list(p.t ORDER BY p.pos)) / count(p.t)
      |         ELSE (eb2.b_hi + eb2.b_lo) / 2 END AS xa,
      |    CASE WHEN count(p.t) > 0
      |         THEN list_sum(list(p.v ORDER BY p.pos)) / count(p.t) END AS ya
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
      |  FROM (SELECT user_id,
      |          list_sum(list((ya - yp) * (ya - yp) ORDER BY i)) AS sum1
      |        FROM (SELECT user_id, i, ya,
      |                lag(ya) OVER (PARTITION BY user_id ORDER BY i) AS yp
      |              FROM efill) GROUP BY 1) d
      |  JOIN (SELECT f.user_id,
      |          list_sum(list((f.ya - a.mn) * (f.ya - a.mn) ORDER BY f.i)) AS sum2
      |        FROM efill f
      |        JOIN (SELECT user_id, list_sum(list(ya ORDER BY i)) / count(*) AS mn
      |              FROM efill GROUP BY 1) a USING (user_id)
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
      |      CASE WHEN count(p.t) > 0
      |           THEN list_sum(list(p.t ORDER BY p.pos)) / count(p.t)
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
      |  SELECT f.user_id, f.k,
      |    list_sum(list(p.t ORDER BY p.pos)) / count(*) AS xr,
      |    list_sum(list(p.v ORDER BY p.pos)) / count(*) AS yr
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
      |    (count(*) * list_sum(list(lx * ly ORDER BY k))
      |       - list_sum(list(lx ORDER BY k)) * list_sum(list(ly ORDER BY k))) /
      |    (count(*) * list_sum(list(lx * lx ORDER BY k))
      |       - list_sum(list(lx ORDER BY k)) * list_sum(list(lx ORDER BY k)))
      |      AS vario_slope
      |  FROM (
      |    SELECT q.user_id, q.k, log10(q.rx) AS lx, log10(q.ry) AS ly
      |    FROM (
      |      SELECT f.user_id, f.k,
      |        list_sum(list(s.vx ORDER BY s.pos)) / count(*) AS rx,
      |        list_sum(list(s.vy ORDER BY s.pos)) / count(*) AS ry
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
      |          sqrt(list_sum(list((p2.v - m.mv) * (p2.v - m.mv) ORDER BY p2.pos))
      |            / count(*)) AS sd
      |        FROM pts p2
      |        JOIN (SELECT user_id, list_sum(list(v ORDER BY pos)) / count(*) AS mv
      |              FROM pts GROUP BY 1) m USING (user_id)
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
      |    SELECT f.user_id, f.k,
      |      list_sum(list(s.nv ORDER BY s.pos)) / count(*) AS pv
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

  /** q53 (`HistShapeDescr` over event-derived stars, templates = the first
    * 3 stars by starId string order, bins = 10, alphabet = 7, slide = false,
    * meth = average) as one SQL derivation:
    *
    *   1. `Kernels.histogram`: ekvi-PAA resample to the ORIGINAL length n
    *      (same border/membership/gap-fill semantics as the abbe chain,
    *      with b = n — CTEs `hbins…hfill`), mean-center, 10 edges over
    *      [min, max] → 9 buckets (half-open, last closed — the membership
    *      rule IS the Scala guard loops' post-condition; `mx = mn`
    *      degenerates to bucket 8), z-score the 9 counts;
    *   2. `Sax.toLetterRep(hist, wordSize=10, alphabet=7)`: normalize
    *      AGAIN (the kernel's own z-norm — applied to already-normed
    *      counts, kept for exact FP parity), then PAA 9→10. With
    *      step = ceil(9/10) = 1 the frame starts are trunc(k·0.9) =
    *      [0,0,1,…,8]: each word letter is one bucket's letter and bucket
    *      0 appears TWICE — so MINDIST runs over the 9 buckets with
    *      weight 2 on bucket 0;
    *   3. MINDIST × scalingFactor √(9/10) (the template word's factor —
    *      constant because every histogram is 9 long), letter distance 0
    *      for adjacent letters else β[max−1] − β[min] on the alphabet-7
    *      breakpoints; average over the 3 templates.
    */
  val q53Sql: String =
    """WITH RECURSIVE pts AS (
      |  SELECT user_id, epoch_ns(ts)/86400e9 AS t, value AS v,
      |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)/86400e9, value) AS pos
      |  FROM events),
      |u AS (
      |  SELECT user_id, count(*) AS n, min(t) AS tmin, max(t) AS tmax
      |  FROM pts GROUP BY 1 HAVING count(*) > 10),
      |hbins AS (
      |  SELECT e.user_id, gs.i,
      |    (e.tmin - e.h) + gs.i * ((e.tmax + e.h) - (e.tmin - e.h)) / e.n AS b_lo,
      |    (e.tmin - e.h) + (gs.i + 1) * ((e.tmax + e.h) - (e.tmin - e.h)) / e.n AS b_hi
      |  FROM (SELECT user_id, n, tmin, tmax, (tmax - tmin) / n / 2.0 AS h FROM u) e,
      |    LATERAL (SELECT unnest(generate_series(0, e.n - 1)) AS i) gs),
      |hxa AS (
      |  SELECT hb.user_id, hb.i,
      |    CASE WHEN count(p.t) > 0
      |         THEN list_sum(list(p.t ORDER BY p.pos)) / count(p.t)
      |         ELSE (hb.b_hi + hb.b_lo) / 2 END AS xa,
      |    CASE WHEN count(p.t) > 0
      |         THEN list_sum(list(p.v ORDER BY p.pos)) / count(p.t) END AS ya
      |  FROM hbins hb LEFT JOIN pts p
      |    ON p.user_id = hb.user_id AND p.t >= hb.b_lo AND p.t < hb.b_hi
      |  GROUP BY hb.user_id, hb.i, hb.b_lo, hb.b_hi),
      |hrep AS (
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
      |    FROM hxa)),
      |hgap AS (
      |  SELECT g.user_id, g.i, g.xa, r.xa AS xr, r.ya AS yb
      |  FROM (
      |    SELECT user_id, i, xa, ya,
      |      min(CASE WHEN ya IS NOT NULL THEN i END) OVER (PARTITION BY user_id
      |        ORDER BY i ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ri
      |    FROM hrep QUALIFY ya IS NULL) g
      |  JOIN hrep r ON r.user_id = g.user_id AND r.i = g.ri),
      |hfill AS (
      |  SELECT user_id, i, xa, ya FROM hrep WHERE ya IS NOT NULL
      |  UNION ALL
      |  SELECT g.user_id, g.i, g.xa,
      |    ((g.xa - p.xa) / ((g.xa - p.xa) + (g.xr - g.xa))) * p.ya
      |      + ((g.xr - g.xa) / ((g.xa - p.xa) + (g.xr - g.xa))) * g.yb
      |  FROM hfill p JOIN hgap g ON g.user_id = p.user_id AND g.i = p.i + 1),
      |hcent AS (
      |  SELECT f.user_id, f.i, f.ya - m.mv AS cv
      |  FROM hfill f JOIN (SELECT user_id, list_sum(list(ya ORDER BY i)) / count(*) AS mv
      |                     FROM hfill GROUP BY 1) m USING (user_id)),
      |hrange AS (SELECT user_id, min(cv) AS mn, max(cv) AS mx FROM hcent GROUP BY 1),
      |hbkt AS (
      |  SELECT c.user_id, gs.j
      |  FROM hcent c JOIN hrange r USING (user_id),
      |    LATERAL (SELECT unnest(generate_series(0, 8)) AS j) gs
      |  WHERE (r.mx = r.mn AND gs.j = 8)
      |     OR (r.mx > r.mn
      |         AND c.cv >= r.mn + gs.j * (r.mx - r.mn) / 9
      |         AND (gs.j = 8 OR c.cv < r.mn + (gs.j + 1) * (r.mx - r.mn) / 9))),
      |hcnt AS (
      |  SELECT ug.user_id, ug.j, CAST(count(k.j) AS DOUBLE) AS c
      |  FROM (SELECT u.user_id, gs.j FROM u,
      |        (SELECT unnest(generate_series(0, 8)) AS j) gs) ug
      |  LEFT JOIN hbkt k ON k.user_id = ug.user_id AND k.j = ug.j
      |  GROUP BY ug.user_id, ug.j),
      |hn1 AS (
      |  SELECT c.user_id, c.j,
      |    CASE WHEN s.sd < 1e-6 THEN 0.0 ELSE (c.c - s.m) / s.sd END AS v
      |  FROM hcnt c JOIN (
      |    SELECT c2.user_id, m.m AS m,
      |      sqrt(list_sum(list((c2.c - m.m) * (c2.c - m.m) ORDER BY c2.j))
      |        / count(*)) AS sd
      |    FROM hcnt c2 JOIN (SELECT user_id, list_sum(list(c ORDER BY j)) / count(*) AS m
      |                       FROM hcnt GROUP BY 1) m USING (user_id)
      |    GROUP BY c2.user_id, m.m) s USING (user_id)),
      |hn2 AS (
      |  SELECT c.user_id, c.j,
      |    CASE WHEN s.sd < 1e-6 THEN 0.0 ELSE (c.v - s.m) / s.sd END AS v
      |  FROM hn1 c JOIN (
      |    SELECT c2.user_id, m.m AS m,
      |      sqrt(list_sum(list((c2.v - m.m) * (c2.v - m.m) ORDER BY c2.j))
      |        / count(*)) AS sd
      |    FROM hn1 c2 JOIN (SELECT user_id, list_sum(list(v ORDER BY j)) / count(*) AS m
      |                      FROM hn1 GROUP BY 1) m USING (user_id)
      |    GROUP BY c2.user_id, m.m) s USING (user_id)),
      |hlet AS (
      |  SELECT user_id, j,
      |    CASE WHEN v < -1.07 THEN 0 WHEN v < -0.57 THEN 1 WHEN v < -0.18 THEN 2
      |         WHEN v < 0.18 THEN 3 WHEN v < 0.57 THEN 4 WHEN v < 1.07 THEN 5
      |         ELSE 6 END AS li
      |  FROM hn2),
      |tmpl AS (SELECT user_id FROM u ORDER BY 'user_' || user_id LIMIT 3),
      |dist AS (
      |  SELECT a.user_id, b.user_id AS t_id, a.j,
      |    CASE WHEN abs(a.li - b.li) <= 1 THEN 0.0
      |         ELSE ([-1.07, -0.57, -0.18, 0.18, 0.57, 1.07])[greatest(a.li, b.li)]
      |            - ([-1.07, -0.57, -0.18, 0.18, 0.57, 1.07])[least(a.li, b.li) + 1] END AS d
      |  FROM hlet a
      |  JOIN hlet b ON b.j = a.j AND b.user_id IN (SELECT user_id FROM tmpl)),
      |mind AS (
      |  SELECT user_id, t_id,
      |    sqrt(0.9) * sqrt(list_sum(
      |      list((CASE WHEN j = 0 THEN 2.0 ELSE 1.0 END) * d * d ORDER BY j))) AS dd
      |  FROM dist GROUP BY 1, 2)
      |SELECT 'user_' || user_id AS starId,
      |  round(list_sum(list(dd ORDER BY 'user_' || t_id)) / count(*), 6) AS hist_dissim
      |FROM mind GROUP BY user_id""".stripMargin

  val q50Sql: String =
    s"""WITH RECURSIVE $kernelCtes,
       |skk AS (
       |  SELECT user_id,
       |    CASE WHEN m2 = 0 THEN 0.0 ELSE m3 / pow(m2, 1.5) END AS skewness,
       |    CASE WHEN m2 = 0 THEN -3.0 ELSE m4 / pow(m2, 2.0) - 3.0 END AS kurtosis
       |  FROM (
       |    SELECT p.user_id,
       |      list_sum(list(pow(p.v - m.mv, 2) ORDER BY p.pos)) / count(*) AS m2,
       |      list_sum(list(pow(p.v - m.mv, 3) ORDER BY p.pos)) / count(*) AS m3,
       |      list_sum(list(pow(p.v - m.mv, 4) ORDER BY p.pos)) / count(*) AS m4
       |    FROM pts p
       |    JOIN (SELECT user_id, list_sum(list(v ORDER BY pos)) / count(*) AS mv
       |          FROM pts GROUP BY 1) m
       |      USING (user_id)
       |    GROUP BY 1))
       |SELECT 'user_' || u.user_id AS starId, round(e.abbe, 6) AS abbe_value,
       |  round(k.skewness, 6) AS skewness, round(k.kurtosis, 6) AS kurtosis,
       |  round(d.density, 6) AS curve_density, round(v.vario_slope, 6) AS variogram_slope
       |FROM u JOIN eabbe e USING (user_id) JOIN skk k USING (user_id)
       |JOIN vslope v USING (user_id) JOIN dens d USING (user_id)""".stripMargin
}
