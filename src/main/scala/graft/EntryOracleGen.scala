package graft

/** Shared DuckDB-oracle SQL generators — the engine-portable CTE
  * builders every [[SparkEntry]] family registry's `oracles` map draws
  * on (hash/LSH/Lloyd/logreg/BPE replays, shared token/session CTEs,
  * the weekly-snapshot reconstructions). Split from SparkEntry (r19),
  * bodies verbatim; see each member's doc for the operator it mirrors. */
private[graft] object EntryOracleGen {

  import SparkEntry.{rentalCte, snapshotCtes}

  val revSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"

  /** DuckDB cosine with the exact arithmetic shape of
    * [[graft.functions.VectorFns.cosine]]: left-to-right double fold
    * (list_reduce), so doubles are bit-identical across engines.
    * DuckDB's builtin list_cosine_similarity accumulates in float and
    * diverges in the 7th decimal — not usable as the oracle. */
  def duckCosine(a: String, b: String): String = {
    def d(x: String, y: String) =
      s"list_reduce(list_transform(generate_series(1, len($a)), i -> $x[i]::DOUBLE * $y[i]::DOUBLE), (acc, v) -> acc + v)"
    s"${d(a, b)} / (sqrt(${d(a, a)}) * sqrt(${d(b, b)}))"
  }

  /** DuckDB replay of Spark's `hash()` (Murmur3_x86_32 over UTF8 bytes,
    * seed 42) for an ASCII string column — the last piece that makes
    * the MinHash signature path portable. 32-bit wraparound arithmetic
    * runs as HUGEINT multiplies mod 2^32; `//` is the unsigned shift
    * (operands are kept non-negative); the aligned 4-byte words and the
    * per-byte tail replay Spark's hashUnsafeBytes structure (tail bytes
    * each take the full mixK1/mixH1 round — Spark's deviation from
    * reference murmur3). ASCII-only: `ord` reads code points, which
    * equal bytes below 128 (the testdata corpus is verified ASCII; a
    * non-ASCII corpus would need byte-level access). Returns the mixed
    * value BEFORE finalization — callers chain the fmix stages as CTEs
    * to avoid exponential expression duplication. */
  def duckMurmur3Mixed(s: String): String = {
    val M = "4294967296"
    def rotl(x: String, r: Int) =
      s"(((($x) * ${1L << r}) % $M) | (($x) // ${1L << (32 - r)}))"
    def mixK1(k: String) =
      s"(((${rotl(s"((($k) * 3432918353::HUGEINT) % $M)", 15)}) * 461845907::HUGEINT) % $M)"
    def mixH1(h: String, k: String) =
      s"((((${rotl(s"xor(($h)::BIGINT, ($k)::BIGINT)::HUGEINT", 13)}) * 5 + 3864292196)) % $M)"
    val word = s"(ord(substr($s, 4*ci - 3, 1)) + ord(substr($s, 4*ci - 2, 1)) * 256" +
      s" + ord(substr($s, 4*ci - 1, 1)) * 65536 + ord(substr($s, 4*ci, 1)) * 16777216)::HUGEINT"
    val tail = s"(ord(substr($s, ti, 1)))::HUGEINT"
    val ha = s"list_reduce(list_prepend(42::HUGEINT, list_transform(" +
      s"generate_series(1, length($s) // 4), ci -> $word)), " +
      s"(h1, w) -> ${mixH1("h1", mixK1("w"))})"
    s"list_reduce(list_prepend(($ha), list_transform(" +
      s"generate_series(length($s) - length($s) % 4 + 1, length($s)), ti -> $tail)), " +
      s"(h1, kb) -> ${mixH1("h1", mixK1("kb"))})"
  }

  /** fmix + sign + pmod(prime) CTE chain over a (doc_id, s) frame named
    * `shx`: emits `mh` with (doc_id, h) where h is the kernel's
    * pmod(murmur3(s), 2^31−1). */
  def duckMurmur3Cte: String =
    s"""hraw AS (SELECT doc_id, (${duckMurmur3Mixed("s")})::BIGINT AS hh, length(s) AS n FROM shx),
       |f1 AS (SELECT doc_id, xor(hh, n) AS x FROM hraw),
       |f2 AS (SELECT doc_id, ((xor(x, x // 65536)::HUGEINT * 2246822507::HUGEINT) % 4294967296)::BIGINT AS x FROM f1),
       |f3 AS (SELECT doc_id, ((xor(x, x // 8192)::HUGEINT * 3266489909::HUGEINT) % 4294967296)::BIGINT AS x FROM f2),
       |f4 AS (SELECT doc_id, xor(x, x // 65536) AS u FROM f3),
       |mh AS (SELECT doc_id,
       |  (((CASE WHEN u >= 2147483648 THEN u - 4294967296 ELSE u END) % 2147483647)
       |   + 2147483647) % 2147483647 AS h FROM f4)""".stripMargin

  /** DuckDB replay of Spark's `xxhash64()` (seed 42) for ASCII strings
    * UNDER 32 BYTES — the per-token path [[graft.functions.TextExprs
    * .simhashKernel]] feeds (corpus max token = 8 bytes; a ≥ 32-byte
    * token would need the 4-lane stripe prologue and trips a loud
    * error() in the oracle instead of silently hashing wrong). 64-bit
    * wraparound multiplies run as SPLIT multiplications — HUGEINT is
    * int128, so (2^64−1)·prime would overflow it; (a·b) mod 2^64
    * decomposes as a_lo·b + ((a_hi·b mod 2^32) << 32), every
    * intermediate < 2^97. Emits a CTE chain over a (doc_id, s) frame
    * named `tok`, ending in `hu` = (doc_id, h: unsigned HUGEINT). */
  def duckXxh64Ctes: String = {
    val M = "18446744073709551616::HUGEINT"
    val P1 = "11400714785074694791::HUGEINT"; val P2 = "14029467366897019727::HUGEINT"
    val P3 = "1609587929392839161::HUGEINT"; val P4 = "9650029242287828579::HUGEINT"
    val P5 = "2870177450012600261::HUGEINT"
    def mul64(a: String, b: String) =
      s"(((($a) % 4294967296) * ($b) + (((($a) // 4294967296) * ($b)) % 4294967296) * 4294967296) % $M)"
    def rotl(x: String, r: Int) =
      s"(((($x) * ${1L << r}::HUGEINT) % $M) | (($x) // ${java.math.BigInteger.ONE.shiftLeft(64 - r)}::HUGEINT))"
    def xor64(a: String, b: String) = s"xor(($a)::HUGEINT, ($b)::HUGEINT)"
    val word8 = (0 until 8).map(k =>
      s"ord(substr(s, 8*ci - ${7 - k}, 1))::HUGEINT * ${1L << (8 * k)}::HUGEINT").mkString("(", " + ", ")")
    val word4 = (0 until 4).map(k =>
      s"ord(substr(s, st4 + ${k + 1}, 1))::HUGEINT * ${1L << (8 * k)}::HUGEINT").mkString("(", " + ", ")")
    val byte = "(ord(substr(s, bi, 1)))::HUGEINT"
    def wordStep(h: String, k1: String) = {
      val inner = mul64(rotl(mul64(k1, P2), 31), P1)
      s"((${mul64(rotl(xor64(h, inner), 27), P1)}) + $P4) % $M"
    }
    def byteStep(h: String, b: String) =
      mul64(rotl(xor64(h, mul64(b, P5)), 11), P1)
    s"""guard AS (SELECT CASE WHEN max(length(s)) >= 32
       |  THEN CAST(error('xxh64 oracle: token exceeds the generated <32-byte path') AS INT)
       |  ELSE 1 END AS g FROM tok),
       |x0 AS (SELECT doc_id, s, ((42::HUGEINT + $P5 + length(s))) % $M AS h FROM tok, guard),
       |x1 AS (SELECT doc_id, s, list_reduce(list_prepend(h,
       |    list_transform(generate_series(1, length(s) // 8), ci -> $word8)),
       |    (h2, k1) -> ${wordStep("h2", "k1")}) AS h FROM x0),
       |x2 AS (SELECT doc_id, s, CASE WHEN length(s) % 8 >= 4 THEN
       |    ((${mul64(rotl(xor64("h", mul64(word4, P1)), 23), P2)}) + $P3) % $M
       |  ELSE h END AS h
       |  FROM (SELECT doc_id, s, h, (length(s) // 8) * 8 AS st4 FROM x1) z1),
       |x3 AS (SELECT doc_id, s, list_reduce(list_prepend(h,
       |    list_transform(generate_series(length(s) - length(s) % 4 + 1, length(s)), bi -> $byte)),
       |    (h2, bb) -> ${byteStep("h2", "bb")}) AS h FROM x2),
       |xf1 AS (SELECT doc_id, ${mul64(xor64("h", "h // 8589934592::HUGEINT"), P2)} AS h FROM x3),
       |xf2 AS (SELECT doc_id, ${mul64(xor64("h", "h // 536870912::HUGEINT"), P3)} AS h FROM xf1),
       |hu AS (SELECT doc_id, xor(h::HUGEINT, (h // 4294967296::HUGEINT)::HUGEINT) AS h FROM xf2)""".stripMargin
  }

  /** Merge rounds the BPE oracles generate (must match
    * [[graft.ops.TextOps.vocabBpe]]'s default nMerges). */
  val BpeOracleRounds = 10

  /** Shared CTE chain replaying [[graft.ops.TextOps.vocabBpe]]'s full
    * Sennrich trajectory: word states are chr(1)||sym||chr(2)-wrapped
    * strings, so replace() IS the trainer's left-to-right
    * non-overlapping merge fold (every match self-contained — no
    * delimiter sharing, no cross-symbol false matches); each round
    * re-derives symbol lists, takes the (count desc, pair asc) argmax
    * (`t$r`), and rewrites (`w$(r+1)`). Early exhaustion is survived by
    * a LEFT JOIN on the 1-row argmax: an empty round carries the
    * previous word states forward unchanged (once no pair exists, none
    * can reappear), so the encode half's final-round states stay
    * correct on corpora that exhaust before the last round instead of
    * collapsing every doc to zero tokens. Guarded against control-char
    * collisions in the corpus. */
  lazy val duckBpeCtes: String = {
    val x1 = "chr(1)"; val x2 = "chr(2)"; val us = "chr(31)"
    // Every multiply-referenced CTE in the chain is MATERIALIZED:
    // DuckDB inlines plain CTEs, so each round's two references to the
    // previous round re-evaluate the whole prefix — measured exponential
    // (~3-5× per round; 10 rounds on a TWO-row corpus took 5 s (r9
    // form) / 67 s (aggregate form), both flat at ~50 ms materialized).
    val head =
      s"""wr AS MATERIALIZED (SELECT w, count(*) AS cnt FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents) z
         |  WHERE length(w) >= 1 GROUP BY w),
         |gg AS (SELECT CASE WHEN max(CASE WHEN regexp_matches(w, '[\\x01\\x02\\x1f]')
         |    THEN 1 ELSE 0 END) = 1
         |  THEN CAST(error('bpe oracle: control-char collision in corpus') AS INT)
         |  ELSE 1 END AS ok FROM wr),
         |w0 AS MATERIALIZED (SELECT w, cnt, $x1 || array_to_string(list_transform(
         |    generate_series(1, length(w)), i -> substr(w, i, 1)), $x2 || $x1) || $x2 AS state
         |  FROM wr, gg)""".stripMargin
    // The argmax is an AGGREGATE (min over a {-count, pair} struct), not
    // ORDER BY … LIMIT 1: an aggregate over zero pairs still yields ONE
    // row (a NULL struct), so the exhausted-corpus case keeps the cross
    // join alive and w{r+1} carries w{r} forward unchanged — instead of
    // an empty t-round emptying every later w-CTE and collapsing all
    // docs to zero tokens in the encode half. t$r re-derives the 0/1-row
    // view the vocab output needs.
    val steps = (0 until BpeOracleRounds).map { r =>
      s"""s$r AS (SELECT cnt, string_split(trim(replace(state, $x2 || $x1, $us), $x1 || $x2), $us) AS syms FROM w$r),
         |m$r AS MATERIALIZED (SELECT min({'nn': -n, 'a': a, 'b': b}) AS s FROM (
         |  SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS n FROM (
         |    SELECT syms[ii.i] AS a, syms[ii.i + 1] AS b, cnt
         |    FROM s$r, UNNEST(generate_series(1, len(syms) - 1)) AS ii(i)
         |    WHERE len(syms) >= 2) z GROUP BY a, b) gz),
         |t$r AS (SELECT s.a AS a, s.b AS b, CAST(-s.nn AS BIGINT) AS n FROM m$r WHERE s.a IS NOT NULL),
         |w${r + 1} AS MATERIALIZED (SELECT w, cnt,
         |  CASE WHEN m.s.a IS NULL THEN state
         |    ELSE replace(state, $x1 || m.s.a || $x2 || $x1 || m.s.b || $x2, $x1 || m.s.a || m.s.b || $x2)
         |  END AS state
         |  FROM w$r, m$r m)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Generated plane terms an oracle carries; covers corpora up to
    * 2^(MaxOraclePlanes+slack) rows before the loud error() trips —
    * orders of magnitude past any driver-verify sf. */
  val MaxOraclePlanes = 12

  /** DuckDB replay of [[graft.functions.VectorFns.lshBucket]] composed
    * with [[graft.ops.VectorOps.sizedPlanes]] auto-sizing: the
    * hyperplane coefficients are splitmix64-derived constants, so this
    * generator embeds them as DOUBLE[] literals via the SAME Scala
    * function the Catalyst expression uses, and the dot product replays
    * the left-to-right fold (list_reduce) that [[VecDot]] computes —
    * sign decisions are bit-identical. The bit width itself is DATA-
    * derived (planes = clamp(ceil(log2 N) − slack)), so the oracle
    * masks its generated plane terms by a count-computed `pl.planes`
    * scalar instead of freezing a width — the same SQL stays correct at
    * any sf, and a corpus beyond the generated terms fails LOUDLY via
    * error() rather than silently under-banding. */
  def duckLshPlanes(countSql: String, slack: Int): String =
    s"""pl AS (SELECT CASE WHEN least(24, greatest(2, CAST(ceil(log2(($countSql))) AS INT) - $slack)) > $MaxOraclePlanes
       |  THEN error('lsh oracle: auto planes exceed generated terms')
       |  ELSE least(24, greatest(2, CAST(ceil(log2(($countSql))) AS INT) - $slack)) END AS planes)""".stripMargin

  /** One packed sign-bucket expression for hash table `seed` over a
    * `vec`-named DOUBLE[] column, masked by `pl.planes`. */
  def duckLshBucket(vec: String, seed: Int, dims: Int = 64): String =
    (0 until MaxOraclePlanes).map { p =>
      val coefs = (0 until dims)
        .map(d => graft.functions.VectorFns.planeCoef(seed, p, d).toString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN $p < pl.planes AND list_reduce(list_transform(generate_series(1, $dims), i -> $vec[i] * ($coefs::DOUBLE[])[i]), (a, v) -> a + v) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** `bk` CTE: (vec_id, t, b) bucket membership for `tables` hash
    * tables over the whole embeddings table — each LSH oracle filters
    * its own sides out of this shared frame. */
  def duckLshBanded(tables: Int): String =
    s"""p AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vd FROM embeddings),
       |bk AS (
       |${(0 until tables).map(t =>
          s"  SELECT vec_id, $t AS t, ${duckLshBucket("vd", t)} AS b FROM p, pl")
          .mkString("\n  UNION ALL\n")}
       |)""".stripMargin

  /** Generated table arms for the recall-held near-dup oracles; covers
    * auto-sized planes ≤ 7 (table demand 13 at planes 7 / cos 0.45 —
    * corpora to ~2^12 rows at slack 5, far past driver-verify sf). */
  val MaxOracleTables = 16

  /** [[duckLshPlanes]] extended with the [[graft.ops.VectorOps
    * .sizedTablesMp]] recall dial: `tables` derives from the
    * count-computed `planes` through a Scala-generated CASE — the
    * mapping is evaluated by the SAME Scala function the operator
    * uses, so no floating-point (acos/ln) ever replays in SQL. */
  def duckLshPlanesTables(countSql: String, slack: Int,
      targetCos: Double, targetRecall: Double): String = {
    val cases = (2 to MaxOraclePlanes).map { p =>
      val t = graft.ops.VectorOps.sizedTablesMp(p, targetCos, targetRecall)
      if (t > MaxOracleTables)
        s"WHEN $p THEN CAST(error('lsh oracle: tables exceed generated arms') AS INT)"
      else s"WHEN $p THEN $t"
    }.mkString(" ")
    s"""${duckLshPlanes(countSql, slack).replace("pl AS", "pl0 AS")},
       |pl AS (SELECT planes, CASE planes $cases END AS tables FROM pl0)""".stripMargin
  }

  /** Dynamic-table twin of [[duckLshBanded]]: every generated arm is
    * masked by the count-derived `pl.tables`. Also derives `pk`, the
    * Hamming-1 MULTI-PROBE bucket set ([[graft.ops.VectorOps]]'s
    * `bandedProbes`): per (vector, table), the base bucket plus every
    * single-bit flip of it — pure XOR arithmetic on the packed key, so
    * the probed bucket set replays exactly. Each oracle joins its probe
    * side from `pk` and its build side from `bk`, mirroring the
    * operator's asymmetric banding. */
  def duckLshBandedDyn(): String =
    s"""p AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vd FROM embeddings),
       |bk AS (
       |${(0 until MaxOracleTables).map(t =>
          s"  SELECT vec_id, $t AS t, ${duckLshBucket("vd", t)} AS b FROM p, pl WHERE $t < pl.tables")
          .mkString("\n  UNION ALL\n")}
       |),
       |pk AS (
       |  SELECT vec_id, t,
       |         CASE WHEN ii.i = 0 THEN b ELSE xor(b, 1::BIGINT << (ii.i - 1)) END AS b
       |  FROM bk, pl, UNNEST(generate_series(0, pl.planes)) AS ii(i)
       |)""".stripMargin

  /** CTE chain replaying [[graft.ops.VectorOps.kmeans]]'s full Lloyd
    * trajectory in DuckDB — seeds (first k by vec_id), then per
    * iteration: 6dp-rounded-cosine argmax assignment (ties to lowest
    * cid) and DECIMAL(20,10) dimension-wise means rounded to 6dp. The
    * final assignment lives in `asg$iters`. Mechanical generation keeps
    * the oracle in lockstep with the operator's iteration count. */
  /** CTE chain replaying [[graft.ops.TextOps.docQualityLogreg]]'s full
    * gradient-descent trajectory in DuckDB: zero-init weights, per-iter
    * 6dp-rounded sigmoid, DECIMAL(28,12) gradient sums, 6dp-rounded
    * weight updates — appended after the shared `toks` CTE. */
  def duckLogregCte(iters: Int, lr: Double): String = {
    val sw = inList(graft.functions.TextFns.StopwordsEn)
    val feat =
      s"""feat AS (
         |  SELECT doc_id,
         |    ((  (len(t) BETWEEN 20 AND 100000)::int
         |      + (round(len(list_filter(t, x -> x IN $sw))::double / len(t), 6) >= 0.001)::int
         |      + (round(len(regexp_extract_all(norm, '[^a-z0-9 ]'))::double / greatest(length(norm), 1), 6) <= 0.2)::int
         |      + (round(len(regexp_extract_all(norm, '[0-9]'))::double / greatest(length(norm), 1), 6) <= 0.3)::int
         |     ) >= 3)::int AS y,
         |    round(ln(1 + len(t)), 6) AS x1,
         |    round(len(list_filter(t, x -> x IN $sw))::double / len(t), 6) AS x2,
         |    round(len(regexp_extract_all(norm, '[^a-z0-9 ]'))::double / greatest(length(norm), 1), 6) AS x3,
         |    round(len(regexp_extract_all(norm, '[0-9]'))::double / greatest(length(norm), 1), 6) AS x4
         |  FROM toks),
         |w0 AS (SELECT 0.0::DOUBLE AS w0, 0.0::DOUBLE AS w1, 0.0::DOUBLE AS w2,
         |              0.0::DOUBLE AS w3, 0.0::DOUBLE AS w4)""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""p$i AS (
         |  SELECT f.*, round(1.0::DOUBLE / (1.0::DOUBLE
         |    + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3 + w.w4 * f.x4))), 6) AS p
         |  FROM feat f CROSS JOIN w$i w),
         |g$i AS (
         |  SELECT COUNT(*) AS n,
         |    SUM(CAST((p - y) AS DECIMAL(28,12))) AS g0,
         |    SUM(CAST((p - y) * x1 AS DECIMAL(28,12))) AS g1,
         |    SUM(CAST((p - y) * x2 AS DECIMAL(28,12))) AS g2,
         |    SUM(CAST((p - y) * x3 AS DECIMAL(28,12))) AS g3,
         |    SUM(CAST((p - y) * x4 AS DECIMAL(28,12))) AS g4
         |  FROM p$i),
         |w${i + 1} AS (
         |  SELECT round(w.w0 - $lr * (CAST(g.g0 AS DOUBLE) / g.n), 6) AS w0,
         |         round(w.w1 - $lr * (CAST(g.g1 AS DOUBLE) / g.n), 6) AS w1,
         |         round(w.w2 - $lr * (CAST(g.g2 AS DOUBLE) / g.n), 6) AS w2,
         |         round(w.w3 - $lr * (CAST(g.g3 AS DOUBLE) / g.n), 6) AS w3,
         |         round(w.w4 - $lr * (CAST(g.g4 AS DOUBLE) / g.n), 6) AS w4
         |  FROM w$i w CROSS JOIN g$i g)""".stripMargin
    }
    (feat +: steps).mkString(",\n")
  }

  def duckKmeansCte(k: Int, iters: Int,
      source: String = "embeddings"): String = {
    // seed rank = md5(vec_id) with vec_id tie-break — must stay in
    // lockstep with VectorOps.kmeansAssigned's seed selection
    val seeds =
      s"""emb AS (SELECT vec_id, embedding AS v FROM $source),
         |cents0 AS (
         |  SELECT (row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)) - 1 AS cid,
         |         v AS c
         |  FROM (SELECT vec_id, v FROM emb
         |        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k) s)""".stripMargin
    val steps = (0 to iters).map { i =>
      val assign =
        s"""scored$i AS (
           |  SELECT e.vec_id, s.cid, round(${duckCosine("e.v", "s.c")}, 6) + 0 AS sim
           |  FROM emb e, cents$i s),
           |asg$i AS (
           |  SELECT vec_id, cid, sim FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id
           |      ORDER BY sim DESC, cid) AS rn FROM scored$i) WHERE rn = 1)""".stripMargin
      if (i == iters) assign
      else assign + ",\n" +
        s"""mx$i AS (
           |  SELECT cid, i, round(CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE)
           |    / COUNT(*), 6) AS m
           |  FROM (SELECT a.cid, UNNEST(e.v) AS x,
           |          UNNEST(generate_series(1, len(e.v))) AS i
           |        FROM asg$i a JOIN emb e ON a.vec_id = e.vec_id) t
           |  GROUP BY cid, i),
           |cents${i + 1} AS (SELECT cid, list(m ORDER BY i) AS c FROM mx$i GROUP BY cid)""".stripMargin
    }
    (seeds +: steps).mkString(",\n")
  }

  /** Shared DuckDB CTE: events with `ts` truncated to microseconds —
    * exactly what Spark sees (nanos read as long, `ts DIV 1000`). */
  val eventsCte: String =
    "e AS (SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type, value, props FROM events)"

  /** Shared DuckDB CTE: canonical tokens per document (mirrors
    * [[graft.functions.TextFns.tokens]]). */
  val toksCte: String =
    """toks AS (
      |  SELECT doc_id,
      |         lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm,
      |         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |  FROM documents)""".stripMargin

  def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Shared oracle for the delta exact-dedup pair: the delta is the
    * % 10 = 0 split UNION planted re-keyed copies of existing docs
    * (doc_id + 9000000 keeps them disjoint from every real id). */
  lazy val dedupExactDeltaOracle: String =
    s"""WITH $toksCte,
       |idx AS (SELECT md5(norm) AS fp_md5, MIN(doc_id) AS dup_of
       |        FROM toks WHERE doc_id % 10 <> 0 GROUP BY 1),
       |delta AS (
       |  SELECT doc_id, norm FROM toks WHERE doc_id % 10 = 0
       |  UNION ALL
       |  SELECT doc_id + 9000000, norm FROM toks
       |  WHERE doc_id % 10 <> 0 AND doc_id % 97 = 3)
       |SELECT d.doc_id, md5(d.norm) AS fp_md5, idx.dup_of
       |FROM delta d JOIN idx ON md5(d.norm) = idx.fp_md5""".stripMargin

  /** Full corpus-curation oracle (the `corpus_keep` query) as a
    * standalone statement — also embedded as a named subquery by the
    * `corpus_keep_semantic` oracle (its own WITH scope nests cleanly). */
  lazy val corpusKeepSql: String =
    s"""WITH $jaccardPairsCtes,
       |q AS (
       |  SELECT doc_id,
       |    ((len(t) BETWEEN 20 AND 100000)::int
       |     + (round(len(list_filter(t, x -> x IN ${inList(graft.functions.TextFns.StopwordsEn)}))::double / len(t), 6) >= 0.001)::int
       |     + (round(len(regexp_extract_all(norm, '[^a-z0-9 ]'))::double / greatest(length(norm), 1), 6) <= 0.2)::int
       |     + (round(len(regexp_extract_all(norm, '[0-9]'))::double / greatest(length(norm), 1), 6) <= 0.3)::int
       |     >= 3)::int AS quality_ok
       |  FROM toks WHERE doc_id % 10 <> 0),
       |canon AS (
       |  SELECT doc_id,
       |    (doc_id = min(doc_id) OVER (PARTITION BY md5(norm)))::int AS canonical
       |  FROM toks),
       |losers AS (SELECT DISTINCT doc_b AS doc_id FROM jacc_pairs
       |           WHERE jaccard >= 0.8),
       |sh5 AS (
       |  SELECT doc_id, CASE WHEN len(t) >= 5 THEN list_distinct(list_transform(
       |      generate_series(1, len(t)-4),
       |      i -> ('0x' || substr(md5(array_to_string(t[i:i+4], ' ')), 1, 15))::BIGINT))
       |    ELSE []::BIGINT[] END AS s
       |  FROM toks),
       |ev AS (SELECT DISTINCT unnest(s) AS shingle FROM sh5 WHERE doc_id % 10 = 0),
       |coll AS (
       |  SELECT c.doc_id, count(*) AS n_collisions
       |  FROM (SELECT doc_id, unnest(s) AS shingle FROM sh5 WHERE doc_id % 10 <> 0) c
       |  JOIN ev USING (shingle) GROUP BY 1)
       |SELECT doc_id, quality_ok, canonical,
       |  CASE WHEN losers.doc_id IS NULL THEN 1 ELSE 0 END AS neardup_ok,
       |  (coalesce(n_collisions, 0) = 0)::int AS clean,
       |  quality_ok * canonical
       |    * (CASE WHEN losers.doc_id IS NULL THEN 1 ELSE 0 END)
       |    * (coalesce(n_collisions, 0) = 0)::int AS keep
       |FROM q JOIN canon USING (doc_id)
       |LEFT JOIN losers USING (doc_id)
       |LEFT JOIN coll USING (doc_id)""".stripMargin

  /** Shared DuckDB CTE chain: winnowing fingerprint sets per document
    * (mirrors [[graft.functions.TextExprs.WinnowFps]] with k=3, w=4:
    * positional 3-gram 60-bit md5 hashes, sliding 4-window minima). */
  val winnowCtes: String =
    s"""$toksCte,
       |gr AS (SELECT doc_id, list_transform(generate_series(1, len(t)-2),
       |         i -> array_to_string(t[i:i+2], ' ')) AS g
       |       FROM toks WHERE len(t) >= 3),
       |h AS (SELECT doc_id, list_transform(g,
       |        s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs FROM gr),
       |w AS (SELECT doc_id, list_distinct(list_transform(
       |        generate_series(1, len(hs)-3), i -> list_min(hs[i:i+3]))) AS fps
       |      FROM h WHERE len(hs) >= 4)""".stripMargin

  /** Shared DuckDB CTE chain: 3-gram shingle near-dup candidate pairs with
    * the df≤100 stop-shingle cap (mirrors [[TextOps.nearDupJaccard]],
    * including its 60-bit-md5 shingle hashing — both engines hash, so
    * set sizes/shared counts agree exactly even under collisions). */
  val jaccardPairsCtes: String =
    s"""$toksCte,
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    generate_series(1, len(t)-2),
       |    i -> ('0x' || substr(md5(array_to_string(t[i:i+2], ' ')), 1, 15))::BIGINT)) AS s
       |  FROM toks WHERE len(t) >= 3),
       |sizes AS (SELECT doc_id, len(s) AS n_sh FROM sh WHERE len(s) > 0),
       |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh WHERE len(s) > 0),
       |rare AS (SELECT shingle FROM ex GROUP BY 1 HAVING count(*) <= 100),
       |exr AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN rare USING (shingle)),
       |shared_counts AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
       |  FROM exr a JOIN exr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jacc_pairs AS (
       |  SELECT doc_a, doc_b, shared, sa.n_sh AS n_a, sb.n_sh AS n_b,
       |         round(shared::double / (sa.n_sh + sb.n_sh - shared), 6) AS jaccard
       |  FROM shared_counts
       |  JOIN sizes sa ON doc_a = sa.doc_id
       |  JOIN sizes sb ON doc_b = sb.doc_id)""".stripMargin

  /** Shared DuckDB CTE chain: per-user 30-min-gap session derivation
    * (mirrors [[EventOps.sessionize]]); expects CTE `e` in scope. */
  val sessFlagsCtes: String =
    """flags AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flags)""".stripMargin

  lazy val eventsInWindowsOracle: String =
    s"""WITH $eventsCte,
       |$sessFlagsCtes,
       |sessions AS (
       |  SELECT user_id, session_seq,
       |    MIN(ts) AS session_start, MAX(ts) AS session_end, COUNT(*) AS n_events
       |  FROM sess GROUP BY 1, 2),
       |w AS (
       |  SELECT user_id AS window_user, session_seq, session_start, session_end
       |  FROM sessions WHERE user_id < 50 AND n_events >= 3)
       |SELECT w.window_user, w.session_seq,
       |  COUNT(*) AS n_events_in_window,
       |  COUNT(DISTINCT e.user_id) AS n_users_in_window,
       |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value_in_window
       |FROM e JOIN w ON e.ts BETWEEN w.session_start AND w.session_end
       |GROUP BY 1, 2""".stripMargin

  val weeklySummaryOracle: String = {
    val (ctes, fin) = snapshotCtes("rental", "")
    s"WITH $rentalCte,\n$ctes\nSELECT * FROM $fin ORDER BY week_beginning"
  }

  val weeklyWowOracle: String = {
    val (ctes, fin) = snapshotCtes("rental", "")
    s"""WITH $rentalCte,
       |$ctes
       |SELECT week_beginning, newly_rented_during_week,
       |  newly_rented_during_week - lag(newly_rented_during_week) OVER w
       |    AS wow_rented_delta,
       |  round((newly_rented_during_week - lag(newly_rented_during_week) OVER w)::DOUBLE
       |    / NULLIF(lag(newly_rented_during_week) OVER w, 0), 6) AS wow_rented_pct,
       |  outstanding_rentals_at_week_end,
       |  outstanding_rentals_at_week_end - lag(outstanding_rentals_at_week_end) OVER w
       |    AS wow_outstanding_delta
       |FROM $fin WINDOW w AS (ORDER BY week_beginning)""".stripMargin
  }

  val upsertRoundOracle: String = upsertRoundOracleSql(noteCol = false)
  /** `noteCol` adds the evolve query's nullable audit column: 'delta'
    * on recomputed rows, NULL on carried-forward pre-evolution rows.
    * `outCol` renames the outstanding column in the output — the
    * rename-evolution query's oracle (the data is identical; only the
    * logical name moved). */
  def upsertRoundOracleSql(noteCol: Boolean,
      outCol: String = "outstanding_rentals_at_week_end"): String = {
    val newNote = if (noteCol) ", 'delta' AS batch_note" else ""
    val oldNote = if (noteCol) ", CAST(NULL AS VARCHAR) AS batch_note" else ""
    val (oldCtes, oldFin) = snapshotCtes("old_src", "old_")
    s"""WITH $rentalCte,
       |old_src AS (SELECT * FROM rental WHERE last_update <= TIMESTAMP '1999-01-01 00:00:00'),
       |$oldCtes,
       |delta AS (SELECT * FROM rental WHERE last_update > TIMESTAMP '1999-01-01 00:00:00'),
       |affected AS (
       |  SELECT DISTINCT DATE_TRUNC('week', rental_date)::date AS week_beginning FROM delta
       |  UNION
       |  SELECT DISTINCT DATE_TRUNC('week', return_date)::date FROM delta WHERE return_date IS NOT NULL),
       |new_base AS (
       |  SELECT a.week_beginning,
       |    (SELECT COUNT(*) FROM rental r
       |     WHERE DATE_TRUNC('week', r.rental_date)::date = a.week_beginning) AS newly_rented_during_week,
       |    (SELECT COUNT(*) FROM rental r
       |     WHERE r.return_date IS NOT NULL
       |       AND DATE_TRUNC('week', r.return_date)::date = a.week_beginning) AS returned_rentals_during_week,
       |    (SELECT COUNT(*) FROM rental r
       |     WHERE r.rental_date::date <= a.week_beginning + 6
       |       AND (r.return_date IS NULL OR r.return_date::date > a.week_beginning + 6)) AS outstanding_rentals_at_week_end
       |  FROM affected a),
       |new_rows AS (
       |  SELECT week_beginning, newly_rented_during_week, returned_rentals_during_week,
       |         newly_rented_during_week - returned_rentals_during_week AS net_change_in_outstanding,
       |         outstanding_rentals_at_week_end
       |  FROM new_base)
       |SELECT week_beginning, newly_rented_during_week, returned_rentals_during_week,
       |       net_change_in_outstanding, outstanding_rentals_at_week_end AS $outCol$newNote FROM new_rows
       |UNION ALL
       |SELECT o.week_beginning, o.newly_rented_during_week, o.returned_rentals_during_week,
       |       o.net_change_in_outstanding, o.outstanding_rentals_at_week_end AS $outCol$oldNote FROM $oldFin o
       |WHERE o.week_beginning NOT IN (SELECT week_beginning FROM affected)
       |ORDER BY week_beginning""".stripMargin
  }

}
