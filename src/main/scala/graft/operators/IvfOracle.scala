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
}
