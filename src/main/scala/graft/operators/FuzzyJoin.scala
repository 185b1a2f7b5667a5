package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy) string join — the entity-resolution primitive
  * (same product under two spellings, same author with a typo) that a
  * naive implementation writes as a Cartesian levenshtein, which is dead
  * at any scale. Here candidates come from a character q-gram equi-join
  * with the Gravano count filter, and only candidates pay the DP:
  *
  *   - each side explodes to (id, gram, multiplicity) — one map-side pass;
  *   - the gram equi-join + a per-pair Σ min(mult_l, mult_r) computes the
  *     BAG-intersection size (bag, not set: the q-gram lemma — one edit
  *     destroys at most `n` grams — holds for multisets, and set-collapse
  *     would break it on repeated-gram strings like "aaaa");
  *   - pairs keep only if shared ≥ max(|s|,|t|) − n + 1 − n·k (clamped to
  *     1), a NECESSARY condition for distance ≤ k, then the exact
  *     `levenshtein(l, r, k)` (early-exit DP, codegen'd) decides;
  *   - the lemma's bound is vacuous only when BOTH strings are shorter
  *     than n·(k+1) — those pairs cannot be guaranteed to share a gram, so
  *     the short×short corner joins by LENGTH BAND instead (length is ±k
  *     for any match — still an equi-ish prune, and the short side of a
  *     name domain is small by construction).
  *
  * Exactness: gram-path ∪ short-path is a provable superset of all
  * distance-≤k pairs (spec-checked against brute force), and the final
  * levenshtein makes the result exact. At 100 TB the join is dimension-
  * shaped (name domains, hosts, titles — not the corpus body); for a
  * web-scale fuzzy SELF-join add prefix filtering on rare grams, the
  * standard next pruning level.
  */
object FuzzyJoin {

  /** (left id, right id, distance) for every cross-side pair with
    * `levenshtein ≤ maxDistance`. Ids must be unique per side.
    */
  def fuzzyPairs(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftStr: String,
      rightId: String,
      rightStr: String,
      maxDistance: Int,
      n: Int = 2): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(n >= 1, s"n must be >= 1, got $n")
    val shortLen = n * (maxDistance + 1) // lemma bound vacuous below this
    val l = left.select(col(leftId).as("__lid"), col(leftStr).as("__ls"),
      length(col(leftStr)).as("__ll"))
    val r = right.select(col(rightId).as("__rid"), col(rightStr).as("__rs"),
      length(col(rightStr)).as("__rl"))

    // (gram, multiplicity) rows straight out of the native generator (r21):
    // the declarative transform+explode+groupBy form paid an interpreted
    // per-element lambda AND a hash-aggregate exchange keyed on the FULL
    // string just to count per-row gram multiplicities
    def gramCounts(df: DataFrame, id: String, s: String, len: String): DataFrame =
      df.filter(col(len) >= n)
        .select(col(id), col(s), col(len),
          graft.functions.FuzzyGramFunctions.charGramCounts(col(s), n)
            .as(Seq("__g", "__c")))

    val dist = levenshtein(col("__ls"), col("__rs"), maxDistance)
    val verified: Column => DataFrame => DataFrame = pre => df =>
      df.filter(pre)
        .select(col("__lid").as("left_id"), col("__rid").as("right_id"),
          dist.as("distance"))
        .filter(col("distance") =!= -1)

    // gram path: finds every qualifying pair whose LONGER string has at
    // least one gram-lemma slot, i.e. max(len) >= shortLen
    val lg = gramCounts(l, "__lid", "__ls", "__ll")
    val rg = gramCounts(r, "__rid", "__rs", "__rl")
    val gramPairs = lg.join(rg, "__g")
      .groupBy(col("__lid"), col("__ls"), col("__ll"),
        col("__rid"), col("__rs"), col("__rl"))
      .agg(sum(least(lg("__c"), rg("__c"))).as("__shared"))
      .filter(greatest(col("__ll"), col("__rl")) >= shortLen)
      .filter(col("__shared") >=
        greatest(lit(1L),
          (greatest(col("__ll"), col("__rl")) - lit(n - 1) - lit(n * maxDistance)).cast("long")))
    val gramVerified = verified(abs(col("__ll") - col("__rl")) <= maxDistance)(gramPairs)

    // short×short corner: both strings below the lemma floor — banded
    // nested join on length (any match is within ±maxDistance in length)
    val ls = l.filter(col("__ll") < shortLen)
    val rs = r.filter(col("__rl") < shortLen)
    val shortVerified = verified(lit(true))(
      ls.join(broadcast(rs), abs(col("__ll") - col("__rl")) <= maxDistance))

    gramVerified.unionByName(shortVerified)
  }

  /** [[fuzzyPairs]] with PREFIX FILTERING — the web-scale pruning level the
    * count filter alone lacks. Same exact result; far fewer candidate pairs
    * on large sides, because a pair must now share one of only `n·k + 1`
    * designated grams per string instead of ANY gram:
    *
    * under any global total order on tagged grams (a gram tagged with its
    * occurrence index, so the multiset lemma survives set form), if
    * `ed(s, t) ≤ k` then the tagged-gram sets overlap by at least
    * `α = max(|s|,|t|) − n + 1 − n·k`, and two sets overlapping by `α ≥ 1`
    * must collide within their first `|G| − α + 1 ≤ n·k + 1` elements of
    * the shared order. So each side keeps only the first `n·k + 1` tagged
    * grams, and the candidate join runs on the 16-byte `(hash, occ)` key,
    * signature-not-text over the shuffle. Hash collisions only ADD
    * candidates; the exact early-exit levenshtein still decides every pair.
    *
    * TWO orders, both exact (the lemma holds for ANY shared total order):
    *
    *   - `dfOrder = false` (default): `(xxhash64(gram), occ)` — stats-free,
    *     computed map-side, zero extra passes. Hash-uniform, so the prefix
    *     keeps a RANDOM n·k+1 of each string's grams.
    *   - `dfOrder = true`: `(df(gram), xxhash64(gram), occ)` ascending —
    *     the prefix keeps each string's RAREST grams, so common grams
    *     ("th", "er") stop generating candidates and the join fan-out on
    *     Zipf-shaped text drops sharply. Costs one corpus stats pass (gram
    *     document frequencies over BOTH sides, keyed by the 8-byte hash)
    *     and a per-string row_number window; the df table is
    *     vocabulary-sized (≤ alphabet^n) and broadcasts by default — pass
    *     `broadcastDfTable = false` to sort-merge it instead. df is a pure
    *     function of the hash, so the order stays a shared total order and
    *     equal-key elements are identical signatures — exactness is
    *     unconditional either way.
    *
    * The tagging pass is one O(G) native-generator scan per row in the
    * gram count G (r21 — the previous declarative form re-filtered the
    * gram prefix per element, O(G²) through interpreted lambdas), entirely
    * map-side. The short×short corner is the same length-band join as
    * [[fuzzyPairs]].
    */
  def fuzzyPairsPrefix(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      leftStr: String,
      rightId: String,
      rightStr: String,
      maxDistance: Int,
      n: Int = 2,
      dfOrder: Boolean = false,
      broadcastDfTable: Boolean = true): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(n >= 1, s"n must be >= 1, got $n")
    val shortLen = n * (maxDistance + 1)
    val prefixLen = n * maxDistance + 1
    val l = left.select(col(leftId).as("__lid"), col(leftStr).as("__ls"),
      length(col(leftStr)).as("__ll"))
    val r = right.select(col(rightId).as("__rid"), col(rightStr).as("__rs"),
      length(col(rightStr)).as("__rl"))

    // the first prefixLen tagged grams of each string in (hash, occ) order —
    // one O(G) native pass (r21): the declarative tagging filtered the
    // gram-prefix per element (O(G²)) through interpreted lambdas, then
    // array_sort'ed per row; the generator hash-map-counts occurrences and
    // fuses the sort+slice (equal (h, o) keys are identical signatures, so
    // tie order cannot change the emitted multiset)
    def prefixGrams(df: DataFrame, id: String, s: String, len: String): DataFrame =
      df.filter(col(len) >= n)
        .select(col(id), col(s), col(len),
          graft.functions.FuzzyGramFunctions
            .taggedGramPrefix(col(s), n, prefixLen, sorted = true)
            .as(Seq("__h", "__o")))

    // every tagged gram, unsliced — the df-order path picks its prefix
    // AFTER the stats join
    def allGrams(df: DataFrame, id: String, s: String, len: String): DataFrame =
      df.filter(col(len) >= n)
        .select(col(id), col(s), col(len),
          graft.functions.FuzzyGramFunctions
            .taggedGramPrefix(col(s), n, prefixLen, sorted = false)
            .as(Seq("__h", "__o")))

    val (lp, rp) = if (!dfOrder) {
      (prefixGrams(l, "__lid", "__ls", "__ll"),
        prefixGrams(r, "__rid", "__rs", "__rl"))
    } else {
      // one gram stream per side feeds the df aggregation AND the prefix
      // pick — cached so the explode materializes once. (r21 note: an
      // explicit static-width repartition below the tagging was measured
      // and REVERTED — it spread the O(G²) tagging but cost 358 near-empty
      // tasks and 10× the summed task time on dimension-sized sides for a
      // marginal wall gain; the tagging follows the input's scan
      // parallelism, which is the honest width at corpus scale.)
      val lg = graft.pipeline.Dedup.cache(allGrams(l, "__lid", "__ls", "__ll"))
      val rg = graft.pipeline.Dedup.cache(allGrams(r, "__rid", "__rs", "__rl"))
      val dfTab = lg.select(col("__h")).unionAll(rg.select(col("__h")))
        .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      val dfSide = if (broadcastDfTable) broadcast(dfTab) else dfTab.hint("merge")
      def pick(g: DataFrame, id: String): DataFrame = {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col(id))
          .orderBy(col("__df").asc, col("__h").asc, col("__o").asc)
        g.join(dfSide, Seq("__h"))
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= prefixLen)
          .drop("__rk", "__df")
      }
      (pick(lg, "__lid"), pick(rg, "__rid"))
    }
    val candidates = lp.join(rp,
        lp("__h") === rp("__h") && lp("__o") === rp("__o"))
      // a pair sharing several prefix elements must pay ONE levenshtein
      .groupBy(col("__lid"), col("__ls"), col("__ll"),
        col("__rid"), col("__rs"), col("__rl"))
      .agg(count(lit(1)).as("__hits"))
      .filter(greatest(col("__ll"), col("__rl")) >= shortLen)
      .filter(abs(col("__ll") - col("__rl")) <= maxDistance)
    val dist = levenshtein(col("__ls"), col("__rs"), maxDistance)
    val gramVerified = candidates
      .select(col("__lid").as("left_id"), col("__rid").as("right_id"),
        dist.as("distance"))
      .filter(col("distance") =!= -1)

    val ls = l.filter(col("__ll") < shortLen)
    val rs = r.filter(col("__rl") < shortLen)
    val shortVerified =
      ls.join(broadcast(rs), abs(col("__ll") - col("__rl")) <= maxDistance)
        .select(col("__lid").as("left_id"), col("__rid").as("right_id"),
          dist.as("distance"))
        .filter(col("distance") =!= -1)

    gramVerified.unionByName(shortVerified)
  }
}
