package graft.operators

/** DuckDB-SQL generator for the IVF family's oracle mirrors (s03's
  * proven transcription, parameterized) — the r11 realization that the
  * whole "probabilistic" ANN index family is probabilistic only in
  * RECALL, never in value: quantizer training is a deterministic
  * vec_id-mod sample + first-k seed + one DECIMAL Lloyd iteration
  * (s05's cross-engine-exact discipline), assignment and probing are
  * pure functions of the trained centroids with total tiebreaks, and
  * the persisted-index lifecycle entries (s11 build+probe, s14 append,
  * s15 compaction, s18 tombstone delete, s24 stats, s21 recall eval,
  * s10/s13 filtered) differ from s03 only in WHICH population trains
  * the quantizer and WHICH candidates survive the probe — exactly the
  * two parameters this generator exposes. The same SQL that gates s03
  * therefore gates the stored-index entries' outputs, turning
  * PersistedAnnSpec's internal-equivalence gates (stored ≡ rebuilt)
  * into full engine-vs-engine hash gates.
  *
  * The float discipline rides on what d06/s01 proved: cosine =
  * list_sum of per-element double products over both engines' same
  * fold, tie-broken by id before any float ordering matters. */
object IvfOracle {

  /** CTE chain ending in `rn(vec_id, cid, crn)` + `n(vec_id,
    * embedding, nrm)`: train the k=ivfK quantizer on the `embeddings`
    * rows satisfying `trainWhere` (count-derived sampleMod included),
    * then rank EVERY vector's cells by cosine. */
  def ivfCtes(trainWhere: String = "TRUE"): String =
    s"""kk AS (SELECT GREATEST(1, COUNT(*) // ${Similarity.pqTrainSample}) AS m
       |       FROM embeddings WHERE $trainWhere),
       |v AS (SELECT vec_id, u['dim'] AS dim, CAST(u['x'] AS DOUBLE) AS x
       |      FROM (SELECT vec_id,
       |              unnest(list_transform(range(1, len(embedding) + 1),
       |                     i -> {'dim': i - 1, 'x': embedding[i]})) AS u
       |            FROM embeddings WHERE $trainWhere)
       |      WHERE vec_id % (SELECT m FROM kk) = 0),
       |seed AS (SELECT DISTINCT vec_id FROM v ORDER BY vec_id LIMIT ${Similarity.ivfK}),
       |c0 AS (SELECT v.vec_id AS cl, dim, x AS c FROM v JOIN seed USING (vec_id)),
       |d1 AS (SELECT v.vec_id, c0.cl,
       |              SUM(CAST((v.x - c0.c) * (v.x - c0.c) AS DECIMAL(28,18))) AS dist
       |       FROM v JOIN c0 ON v.dim = c0.dim GROUP BY 1, 2),
       |a1 AS (SELECT vec_id, cl FROM (
       |         SELECT vec_id, cl,
       |                ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rk
       |         FROM d1) WHERE rk = 1),
       |c1 AS (SELECT cl, dim,
       |              CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
       |       FROM v JOIN a1 USING (vec_id) GROUP BY 1, 2),
       |cent AS (SELECT cl AS cid, list(c ORDER BY dim) AS ce FROM c1 GROUP BY 1),
       |centn AS (SELECT cid, ce,
       |            sqrt(list_sum(list_transform(range(1, len(ce) + 1),
       |                 i -> ce[i] * ce[i]))) AS cnrm
       |          FROM cent),
       |n AS (SELECT vec_id, embedding,
       |        sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
       |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
       |      FROM embeddings),
       |sc AS (SELECT e.vec_id, c.cid,
       |         list_sum(list_transform(range(1, len(e.embedding) + 1),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * c.ce[i])) / (e.nrm * c.cnrm) AS cs
       |       FROM n e, centn c),
       |rn AS (SELECT vec_id, cid,
       |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS crn
       |       FROM sc)""".stripMargin

  /** Probe tail over [[ivfCtes]]' `rn`/`n`: corpus vectors satisfying
    * `assignedWhere` sit in their crn=1 cell, queries (vec_id < 10)
    * probe their top-`ivfProbes` cells, candidates additionally
    * satisfying `candWhere` are exact-reranked to top-5. Emits the
    * family's (qid, nid, rank, cos) relation. */
  def probeSql(assignedWhere: String = "TRUE",
      candWhere: String = "TRUE"): String =
    s"""assigned AS (SELECT vec_id, cid AS cluster FROM rn
       |             WHERE crn = 1 AND vec_id >= 10 AND ($assignedWhere)),
       |qprobe AS (SELECT vec_id AS qid, cid AS cluster
       |           FROM rn WHERE crn <= ${Similarity.ivfProbes} AND vec_id < 10),
       |cand AS (SELECT qid, a.vec_id AS nid
       |         FROM assigned a JOIN qprobe USING (cluster)
       |         WHERE ($candWhere)),
       |scored AS (SELECT qid, nid,
       |        list_sum(list_transform(range(1, len(q.embedding) + 1),
       |             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |          / (q.nrm * c.nrm) AS cos
       |      FROM cand JOIN n q ON q.vec_id = cand.qid
       |                JOIN n c ON c.vec_id = cand.nid),
       |ranked AS (SELECT qid, nid, rank, cos FROM (
       |  SELECT qid, nid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored) WHERE rank <= 5)""".stripMargin

  /** Complete (qid, nid, rank, cos) mirror: the s03 shape under a
    * parameterized training population and candidate filter. */
  def probeOracle(trainWhere: String = "TRUE",
      assignedWhere: String = "TRUE", candWhere: String = "TRUE"): String =
    s"""WITH ${ivfCtes(trainWhere)},
       |${probeSql(assignedWhere, candWhere)}
       |SELECT qid, nid, rank, cos FROM ranked ORDER BY qid, rank""".stripMargin

  /** s07's product-quantization mirror: first-k-init + one-Lloyd
    * codebook per subspace over the deterministic sample (squared-L2
    * assignment as the same fixed-order double fold, DECIMAL mean
    * update, dense-remapped ids), frozen-codebook encode of the whole
    * corpus, per-query DECIMAL LUTs, the ADC scan as a subspace-ordered
    * double fold, and the exact top-5 rerank of the top-`pqCandidates`
    * ADC survivors. */
  def pqProbeOracle: String = {
    val M = Similarity.pqSubspaces
    val SD = Similarity.pqSubDim
    val K = Similarity.pqK
    s"""WITH nsz AS (SELECT GREATEST(1, COUNT(*) // ${Similarity.pqTrainSample}) AS m
       |             FROM embeddings),
       |sv AS (SELECT vec_id, sub, list_transform(range(1, $SD + 1),
       |              j -> CAST(embedding[sub * $SD + j] AS DOUBLE)) AS xs
       |       FROM embeddings, unnest(range(0, $M)) t(sub)
       |       WHERE vec_id % (SELECT m FROM nsz) = 0),
       |c0 AS (SELECT sub, vec_id AS cl, xs AS cs FROM sv
       |       WHERE vec_id < $K * (SELECT m FROM nsz)),
       |a0 AS (SELECT vec_id, sub, cl FROM (
       |         SELECT sv.vec_id, sv.sub, c0.cl,
       |                ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub
       |                  ORDER BY list_sum(list_transform(range(1, $SD + 1),
       |                    j -> (sv.xs[j] - c0.cs[j]) * (sv.xs[j] - c0.cs[j]))), c0.cl) AS rk
       |         FROM sv JOIN c0 USING (sub)) WHERE rk = 1),
       |sx AS (SELECT vec_id, sub, j - 1 AS sdim,
       |              CAST(embedding[sub * $SD + j] AS DOUBLE) AS x
       |       FROM embeddings, unnest(range(0, $M)) t(sub),
       |            unnest(range(1, $SD + 1)) u(j)
       |       WHERE vec_id % (SELECT m FROM nsz) = 0),
       |c1 AS (SELECT sx.sub, a0.cl, sx.sdim,
       |              CAST(SUM(CAST(sx.x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
       |       FROM sx JOIN a0 ON sx.vec_id = a0.vec_id AND sx.sub = a0.sub
       |       GROUP BY 1, 2, 3),
       |c1d AS (SELECT sub, DENSE_RANK() OVER (PARTITION BY sub ORDER BY cl) - 1 AS cl,
       |               sdim, c FROM c1),
       |cbarr AS MATERIALIZED (SELECT sub, cl, list(c ORDER BY sdim) AS cs
       |                       FROM c1d GROUP BY 1, 2),
       |ev AS (SELECT vec_id, sub, list_transform(range(1, $SD + 1),
       |              j -> CAST(embedding[sub * $SD + j] AS DOUBLE)) AS xs
       |       FROM embeddings, unnest(range(0, $M)) t(sub)),
       |codes AS MATERIALIZED (SELECT vec_id, sub, cl FROM (
       |         SELECT ev.vec_id, ev.sub, cb.cl,
       |                ROW_NUMBER() OVER (PARTITION BY ev.vec_id, ev.sub
       |                  ORDER BY list_sum(list_transform(range(1, $SD + 1),
       |                    j -> (ev.xs[j] - cb.cs[j]) * (ev.xs[j] - cb.cs[j]))), cb.cl) AS rk
       |         FROM ev JOIN cbarr cb USING (sub)) WHERE rk = 1),
       |qx AS (SELECT vec_id AS qid, sub, j - 1 AS sdim,
       |              CAST(embedding[sub * $SD + j] AS DOUBLE) AS x
       |       FROM embeddings, unnest(range(0, $M)) t(sub),
       |            unnest(range(1, $SD + 1)) u(j)
       |       WHERE vec_id < 10),
       |pdot AS MATERIALIZED (SELECT qid, c1d.sub, c1d.cl,
       |              CAST(SUM(CAST(qx.x * c1d.c AS DECIMAL(28,18))) AS DOUBLE) AS pd,
       |              CAST(SUM(CAST(c1d.c * c1d.c AS DECIMAL(28,18))) AS DOUBLE) AS cq
       |         FROM qx JOIN c1d ON qx.sub = c1d.sub AND qx.sdim = c1d.sdim
       |         GROUP BY 1, 2, 3),
       |terms AS (SELECT p.qid, c.vec_id, c.sub, p.pd, p.cq
       |          FROM codes c JOIN pdot p ON p.sub = c.sub AND p.cl = c.cl
       |          WHERE c.vec_id >= 10),
       |adc AS (SELECT qid, vec_id,
       |          list_reduce(list_prepend(0.0::DOUBLE, list(pd ORDER BY sub)),
       |            (a, b) -> a + b) AS num,
       |          list_reduce(list_prepend(0.0::DOUBLE, list(cq ORDER BY sub)),
       |            (a, b) -> a + b) AS den
       |        FROM terms GROUP BY 1, 2),
       |cand AS (SELECT qid, vec_id FROM (
       |          SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |                 ORDER BY num / sqrt(den) DESC, vec_id) AS arn
       |          FROM adc) WHERE arn <= ${Similarity.pqCandidates}),
       |n AS (SELECT vec_id, embedding,
       |        sqrt(list_sum(list_transform(range(1, len(embedding) + 1),
       |             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
       |      FROM embeddings),
       |scored AS (SELECT qid, cand.vec_id AS nid,
       |        list_sum(list_transform(range(1, len(q.embedding) + 1),
       |             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |          / (q.nrm * c.nrm) AS cos
       |      FROM cand JOIN n q ON q.vec_id = cand.qid
       |                JOIN n c ON c.vec_id = cand.vec_id)
       |SELECT qid, nid, rank, cos FROM (
       |  SELECT qid, nid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM scored)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** s08/s12/s19's residual IVF-PQ mirror: coarse quantizer + PQ
    * codebook trained on the `baseWhere` population (one count sizes
    * both training samples, as ivfPqBuild does), residuals r = x −
    * c(x) in double, frozen-state encode of the WHOLE corpus (append ≡
    * rebuild — the pure-function property PersistedAnnSpec pins, here
    * hash-gated), DECIMAL ADC lookup state (pdot/cdot/csq/qc/cnorm),
    * the probed-cell ADC scan with subspace-ordered double folds and
    * the dsq≥0 clamp, and the exact top-5 rerank of the top-
    * `pqCandidates` survivors. */
  def ivfPqProbeOracle(baseWhere: String = "TRUE"): String = {
    val M = Similarity.pqSubspaces
    val SD = Similarity.pqSubDim
    val K = Similarity.pqK
    s"""WITH ${ivfCtes(baseWhere)},
       |aw AS (SELECT vec_id, cid AS cell FROM rn WHERE crn = 1),
       |resid AS MATERIALIZED (SELECT a.vec_id, a.cell,
       |          list_transform(range(1, len(e.embedding) + 1),
       |            i -> CAST(e.embedding[i] AS DOUBLE) - ct.ce[i]) AS emb
       |        FROM aw a JOIN n e ON e.vec_id = a.vec_id
       |                  JOIN cent ct ON ct.cid = a.cell),
       |rsv AS (SELECT vec_id, sub, list_transform(range(1, $SD + 1),
       |              j -> emb[sub * $SD + j]) AS xs
       |        FROM resid, unnest(range(0, $M)) t(sub)
       |        WHERE ($baseWhere) AND vec_id % (SELECT m FROM kk) = 0),
       |pc0 AS (SELECT sub, vec_id AS cl, xs AS cs FROM rsv
       |        WHERE vec_id < $K * (SELECT m FROM kk)),
       |pa0 AS (SELECT vec_id, sub, cl FROM (
       |         SELECT rsv.vec_id, rsv.sub, pc0.cl,
       |                ROW_NUMBER() OVER (PARTITION BY rsv.vec_id, rsv.sub
       |                  ORDER BY list_sum(list_transform(range(1, $SD + 1),
       |                    j -> (rsv.xs[j] - pc0.cs[j]) * (rsv.xs[j] - pc0.cs[j]))), pc0.cl) AS rk
       |         FROM rsv JOIN pc0 USING (sub)) WHERE rk = 1),
       |psx AS (SELECT vec_id, sub, j - 1 AS sdim, xs[j] AS x
       |        FROM rsv, unnest(range(1, $SD + 1)) u(j)),
       |pc1 AS (SELECT psx.sub, pa0.cl, psx.sdim,
       |              CAST(SUM(CAST(psx.x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
       |       FROM psx JOIN pa0 ON psx.vec_id = pa0.vec_id AND psx.sub = pa0.sub
       |       GROUP BY 1, 2, 3),
       |pc1d AS (SELECT sub, DENSE_RANK() OVER (PARTITION BY sub ORDER BY cl) - 1 AS cl,
       |               sdim, c FROM pc1),
       |pcb AS MATERIALIZED (SELECT sub, cl, list(c ORDER BY sdim) AS cs
       |                     FROM pc1d GROUP BY 1, 2),
       |evr AS (SELECT vec_id, cell, sub, list_transform(range(1, $SD + 1),
       |              j -> emb[sub * $SD + j]) AS xs
       |        FROM resid, unnest(range(0, $M)) t(sub)),
       |codes AS MATERIALIZED (SELECT vec_id, cell, sub, cl FROM (
       |         SELECT evr.vec_id, evr.cell, evr.sub, cb.cl,
       |                ROW_NUMBER() OVER (PARTITION BY evr.vec_id, evr.sub
       |                  ORDER BY list_sum(list_transform(range(1, $SD + 1),
       |                    j -> (evr.xs[j] - cb.cs[j]) * (evr.xs[j] - cb.cs[j]))), cb.cl) AS rk
       |         FROM evr JOIN pcb cb USING (sub)) WHERE rk = 1),
       |cellSub AS (SELECT cid AS cell, CAST((i - 1) // $SD AS INT) AS sub,
       |                   (i - 1) % $SD AS sdim, ce[i] AS cx
       |            FROM cent, unnest(range(1, len(ce) + 1)) t(i)),
       |cdot AS MATERIALIZED (SELECT cs2.cell, p.sub, p.cl,
       |              CAST(SUM(CAST(cs2.cx * p.c AS DECIMAL(28,18))) AS DOUBLE) AS cd
       |        FROM cellSub cs2 JOIN pc1d p ON p.sub = cs2.sub AND p.sdim = cs2.sdim
       |        GROUP BY 1, 2, 3),
       |csq AS MATERIALIZED (SELECT sub, cl,
       |              CAST(SUM(CAST(c * c AS DECIMAL(28,18))) AS DOUBLE) AS sq
       |        FROM pc1d GROUP BY 1, 2),
       |cnorm AS (SELECT cell, SUM(CAST(cx * cx AS DECIMAL(28,18))) AS cnormsq
       |          FROM cellSub GROUP BY 1),
       |probeList AS (SELECT vec_id AS qid, cid AS cell
       |              FROM rn WHERE crn <= ${Similarity.ivfProbes} AND vec_id < 10),
       |qsub AS (SELECT vec_id AS qid, CAST((i - 1) // $SD AS INT) AS sub,
       |                (i - 1) % $SD AS sdim, CAST(embedding[i] AS DOUBLE) AS qx
       |         FROM embeddings, unnest(range(1, len(embedding) + 1)) t(i)
       |         WHERE vec_id < 10),
       |qc AS (SELECT q.qid, pl.cell,
       |              SUM(CAST(q.qx * cs2.cx AS DECIMAL(28,18))) AS qcv
       |       FROM qsub q JOIN probeList pl ON pl.qid = q.qid
       |            JOIN cellSub cs2 ON cs2.cell = pl.cell
       |                            AND cs2.sub = q.sub AND cs2.sdim = q.sdim
       |       GROUP BY 1, 2),
       |pdot AS MATERIALIZED (SELECT q.qid, p.sub, p.cl,
       |              CAST(SUM(CAST(q.qx * p.c AS DECIMAL(28,18))) AS DOUBLE) AS pd
       |        FROM qsub q JOIN pc1d p ON p.sub = q.sub AND p.sdim = q.sdim
       |        GROUP BY 1, 2, 3),
       |terms AS (SELECT pl.qid, c.vec_id, c.cell, c.sub, pd.pd, cd.cd, sq.sq
       |          FROM codes c
       |          JOIN probeList pl ON pl.cell = c.cell
       |          JOIN pdot pd ON pd.qid = pl.qid AND pd.sub = c.sub AND pd.cl = c.cl
       |          JOIN cdot cd ON cd.cell = c.cell AND cd.sub = c.sub AND cd.cl = c.cl
       |          JOIN csq sq ON sq.sub = c.sub AND sq.cl = c.cl
       |          WHERE c.vec_id >= 10),
       |adc AS (SELECT qid, vec_id, cell,
       |          list_reduce(list_prepend(0.0::DOUBLE, list(pd ORDER BY sub)),
       |            (a, b) -> a + b) AS pds,
       |          list_reduce(list_prepend(0.0::DOUBLE, list(cd ORDER BY sub)),
       |            (a, b) -> a + b) AS cds,
       |          list_reduce(list_prepend(0.0::DOUBLE, list(sq ORDER BY sub)),
       |            (a, b) -> a + b) AS sqs
       |        FROM terms GROUP BY 1, 2, 3),
       |scoredadc AS (SELECT a.qid, a.vec_id,
       |          GREATEST(0.0::DOUBLE,
       |            CAST(cn.cnormsq AS DOUBLE) + 2 * a.cds + a.sqs) AS dsq,
       |          CAST(q.qcv AS DOUBLE) + a.pds AS num
       |        FROM adc a JOIN qc q ON q.qid = a.qid AND q.cell = a.cell
       |                   JOIN cnorm cn ON cn.cell = a.cell),
       |cand AS (SELECT qid, vec_id FROM (
       |          SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid
       |                 ORDER BY CASE WHEN dsq > 0 THEN num / sqrt(dsq)
       |                          ELSE -1.7976931348623157e308 END DESC, vec_id) AS arn
       |          FROM scoredadc) WHERE arn <= ${Similarity.pqCandidates}),
       |rer AS (SELECT qid, cand.vec_id AS nid,
       |        list_sum(list_transform(range(1, len(q.embedding) + 1),
       |             i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
       |          / (q.nrm * c.nrm) AS cos
       |      FROM cand JOIN n q ON q.vec_id = cand.qid
       |                JOIN n c ON c.vec_id = cand.vec_id)
       |SELECT qid, nid, rank, cos FROM (
       |  SELECT qid, nid, cos,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
       |  FROM rer)
       |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
  }

  /** The greedy MMR rerank (s17/s20's mmrSelect) UNROLLED: the loop is
    * mmrK−1 identical argmax steps, so the mirror emits one CTE pair
    * per step — candidates not yet selected score λ·cos −
    * (1−λ)·max(sim to selected), argmax with the same (score DESC,
    * vec_id) tiebreak. The 1−λ literal is embedded via Scala's
    * shortest-round-trip Double printing, so both engines subtract the
    * bit-identical constant. Requires CTEs `pool(qid, vec_id, cos)`
    * and `n(vec_id, embedding, nrm)` upstream; emits the final
    * (qid, nid, rank, cos) SELECT. */
  def mmrTailSql(): String = {
    val lam = Similarity.mmrLambda.toString
    val oneMinus = (1 - Similarity.mmrLambda).toString
    val steps = (2 to Similarity.mmrK).map { k =>
      s"""sc$k AS (SELECT p.qid, p.vec_id, p.cos, MAX(pc.sim) AS maxsim
         |        FROM pool p
         |        LEFT JOIN u${k - 1} d ON d.qid = p.qid AND d.vec_id = p.vec_id
         |        JOIN u${k - 1} s ON s.qid = p.qid
         |        JOIN pc ON pc.qid = p.qid AND pc.av = p.vec_id AND pc.bv = s.vec_id
         |        WHERE d.vec_id IS NULL
         |        GROUP BY 1, 2, 3),
         |s$k AS (SELECT qid, vec_id, cos, $k AS rank FROM (
         |        SELECT qid, vec_id, cos, ROW_NUMBER() OVER (PARTITION BY qid
         |          ORDER BY $lam * cos - $oneMinus * maxsim DESC, vec_id) AS r
         |        FROM sc$k) WHERE r = 1),
         |u$k AS (SELECT * FROM u${k - 1} UNION ALL SELECT * FROM s$k)""".stripMargin
    }.mkString(",\n")
    s"""pc AS MATERIALIZED (SELECT x.qid, x.vec_id AS av, y.vec_id AS bv,
       |         list_sum(list_transform(range(1, len(na.embedding) + 1),
       |           i -> CAST(na.embedding[i] AS DOUBLE) * CAST(nb.embedding[i] AS DOUBLE)))
       |           / (na.nrm * nb.nrm) AS sim
       |       FROM pool x JOIN pool y ON x.qid = y.qid AND x.vec_id <> y.vec_id
       |       JOIN n na ON na.vec_id = x.vec_id JOIN n nb ON nb.vec_id = y.vec_id),
       |s1 AS (SELECT qid, vec_id, cos, 1 AS rank FROM (
       |       SELECT qid, vec_id, cos, ROW_NUMBER() OVER (PARTITION BY qid
       |         ORDER BY cos DESC, vec_id) AS r FROM pool) WHERE r = 1),
       |u1 AS (SELECT * FROM s1),
       |$steps
       |SELECT qid, vec_id AS nid, rank, cos FROM u${Similarity.mmrK}
       |ORDER BY qid, rank""".stripMargin
  }
}
