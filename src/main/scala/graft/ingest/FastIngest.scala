package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.Functions
import graft.functions.Nt

/** The reference's whole ETL dataflow (SURVEY.md §2-§3), re-expressed as a
  * declarative Spark pipeline:
  *
  *   NT lines → parse (P1) → project/filter (P2/P3) →
  *     ├─ term path: group by id (A1) + sameAs-label enrichment join (J1)
  *     │             → merged docs (A4/K3 semantics) → overwrite sink (K1/K2)
  *     └─ agent path: otherId extraction (P4) → disjunctive lookup join (J2)
  *                    → array-union viaf update (K4)
  *
  * Deterministic deviations from the reference's order-dependent semantics
  * (sanctioned in SURVEY.md §7.4; final-table-state compatible):
  *   - `prefLabel` = min(prefLabel) else min(rdfs:label), instead of
  *     last-write-wins (`lib/ingest.js:245-246`) — FAST carries one prefLabel
  *     per id, so this only changes pathological inputs.
  *   - all array columns are sorted sets (`lib/ingest.js:247` allows altLabel
  *     duplicates; we de-duplicate everywhere `normalized` already did).
  *
  * All stages are narrow projections until the single `groupBy(id)` shuffle;
  * the enrichment join broadcasts the (small) external-label side. At 100 TB
  * the only wide ops are the two groupBys and the join — AQE handles skew,
  * partial aggregation bounds map-side state, and per-group arrays are
  * de-duplicated at partial-agg time via collect_set.
  */
object FastIngest {

  private val PrefLabel = "http://www.w3.org/2004/02/skos/core#prefLabel"
  private val AltLabel = "http://www.w3.org/2004/02/skos/core#altLabel"
  private val RdfsLabel = "http://www.w3.org/2000/01/rdf-schema#label"
  private val SameAs = "http://schema.org/sameAs"

  /** P1 — NT text lines (column `line`, plus passthrough columns) to triples.
    * Malformed lines are dropped (`test/fast_parse.test.js:8-13`).
    * Uses the one-pass [[graft.functions.ParseNt]] expression (single regex
    * match per line instead of one per extracted field).
    */
  def parse(lines: DataFrame): DataFrame = {
    val passthrough = lines.columns.filterNot(_ == "line").map(col)
    lines
      .select(expr("parse_nt(line)").as("_t") +: passthrough: _*)
      .where($"_t".isNotNull)
      .select(Seq($"_t.subject".as("subject"), $"_t.predicate".as("predicate"),
        $"_t.obj".as("obj")) ++ passthrough: _*)
  }

  /** P5 quarantine channel — the complement of [[parse]]: the malformed
    * lines parse drops, preserved with their source context for triage.
    * At scale this is the side output a production ingest writes next to
    * the main tables (same narrow scan; no extra pass — callers union the
    * two sinks off one cached lines frame when both are needed).
    */
  def quarantine(lines: DataFrame): DataFrame =
    lines.where(expr("parse_nt(line)").isNull)

  /** P2/P3 — the predicate-driven projection (`lib/fast_parse.js:17-55`).
    * Output: one row per *kept* triple with a `kind` discriminator:
    * `fast` rows carry (id, prefLabel|altLabel|label|sameAsLc|sameAsViaf,
    * normalized); `sameAsLabel` rows carry (subject, label, normalized).
    */
  def project(triples: DataFrame): DataFrame = {
    val isFast = $"subject".contains("/fast/")
    val isNaN = $"subject".contains("/fast/NaN") || $"obj".contains("/fast/NaN")
    // parseInt-of-trailing-segment semantics (`lib/fast_parse.js:23`), made
    // ANSI-safe: no digits after /fast/ → NULL (dropped later by P5).
    val idStr = regexp_extract($"subject", "/fast/([0-9]+)", 1)
    val id = when(idStr =!= "", idStr).cast(IntegerType)
    val uri = Nt.objectUri($"obj")
    val lit_ = Nt.literalValue($"obj")
    val keptLiteral = when(length(lit_) >= 2, lit_) // length guard, fast_parse.js:33

    val prefLabel = when($"predicate" === PrefLabel, keptLiteral)
    val altLabel = when($"predicate" === AltLabel, keptLiteral)
    val label = when($"predicate" === RdfsLabel, keptLiteral)
    val sameAsLc = when($"predicate" === SameAs && uri.contains("id.loc.gov"), uri)
    val sameAsViaf = when($"predicate" === SameAs && uri.contains("viaf.org"), uri)

    val kind = when(isFast && !isNaN, lit("fast"))
      .when(!isFast && $"predicate" === RdfsLabel && lit_.isNotNull, lit("sameAsLabel"))

    val passthrough = triples.columns
      .filterNot(Set("subject", "predicate", "obj")).map(col)

    triples
      .select(Seq(
        kind.as("kind"),
        when(isFast, id).as("id"),
        prefLabel.as("prefLabel"),
        altLabel.as("altLabel"),
        label.as("label"),
        sameAsLc.as("sameAsLc"),
        sameAsViaf.as("sameAsViaf"),
        when(isFast, Functions.normalizeSingular(coalesce(prefLabel, altLabel, label)))
          .otherwise(Functions.normalizeSingular(lit_)).as("normalized"),
        $"subject") ++ passthrough: _*)
      .where($"kind".isNotNull)
  }

  /** P7 — doc type from the source filename (`lib/ingest.js:201-210`):
    * substring match on the 8 FAST file names; the virtual TermEvent pass
    * maps to Event. Use with `input_file_name()` for multi-file reads.
    */
  def typeFromFilename(file: Column): Column =
    when(file.contains("FASTCorporate"), "Corporate")
      .when(file.contains("FASTTermEvent"), "Event")
      .when(file.contains("FASTEvent"), "Event")
      .when(file.contains("FASTPersonal"), "Personal")
      .when(file.contains("FASTChronological"), "Chronological")
      .when(file.contains("FASTGeographic"), "Geographic")
      .when(file.contains("FASTTitle"), "Title")
      .when(file.contains("FASTTopical"), "Topical")
      .when(file.contains("FASTFormGenre"), "Form")

  /** A1 — group fast fragments into one document per id.
    * `collect_set` gives bounded, de-duplicated partial-agg state; arrays are
    * sorted for deterministic output. sameAs arrays carry both the full URI
    * and its trailing path segment (`lib/ingest.js:248-255`).
    */
  def buildDocs(fragments: DataFrame, docType: Column): DataFrame =
    buildDocsWith(fragments, constantType = Some(docType))

  /** A1 variant for multi-file ingest where fragments carry a per-row
    * `doc_type` (from P7/`input_file_name`): a doc's type is the max over
    * its contributing files' types — the deterministic stand-in for the
    * reference's file-order-dependent overwrite (`lib/ingest.js:291`).
    */
  def buildDocsTagged(fragments: DataFrame): DataFrame =
    buildDocsWith(fragments, constantType = None)

  private def buildDocsWith(fragments: DataFrame, constantType: Option[Column]): DataFrame = {
    def withSegment(c: Column): Column =
      when(c.isNotNull, array(c, Nt.lastSegment(c)))
    val aggs = Seq(
      min($"prefLabel").as("pref"),
      min($"label").as("lbl"),
      sort_array(collect_set($"altLabel")).as("altLabel"),
      sort_array(array_distinct(flatten(collect_list(withSegment($"sameAsLc"))))).as("sameAsLc"),
      sort_array(array_distinct(flatten(collect_list(withSegment($"sameAsViaf"))))).as("sameAsViaf"),
      sort_array(collect_set($"normalized")).as("normalized")) ++
      (if (constantType.isEmpty) Seq(max($"doc_type").as("_type")) else Nil)
    fragments
      .where($"kind" === "fast")
      .groupBy($"id")
      .agg(aggs.head, aggs.tail: _*)
      .where($"id".isNotNull) // P5 bad-record guard (lib/ingest.js:304-307)
      .select(
        $"id".as("_id"),
        $"id".as("fast"),
        constantType.getOrElse($"_type").as("type"),
        coalesce($"pref", $"lbl").as("prefLabel"), // label fills only if no prefLabel
        $"altLabel", $"sameAsLc", $"sameAsViaf", $"normalized")
  }

  /** A2 — external-URI → labels lookup table from sameAsLabel fragments. */
  def sameAsLabels(fragments: DataFrame): DataFrame =
    fragments
      .where($"kind" === "sameAsLabel")
      .groupBy($"subject")
      .agg(
        sort_array(collect_set($"label")).as("extLabels"),
        sort_array(collect_set($"normalized")).as("extNormalized"))

  /** J1 — enrich docs with labels of their sameAs URIs
    * (`lib/ingest.js:264-295`). Only full-URI elements can match — the
    * bare-id segments never join (label table is keyed by full subject URI),
    * which preserves the reference's observable behavior.
    * The label side is small relative to the docs side → broadcast.
    */
  def enrich(docs: DataFrame, labels: DataFrame): DataFrame =
    applyMatches(docs, matchesFromDocs(docs, labels))

  /** Matched external labels per id, probed from doc arrays. */
  private def matchesFromDocs(docs: DataFrame, labels: DataFrame): DataFrame =
    docs
      .select($"_id", explode(concat($"sameAsViaf", $"sameAsLc")).as("uri"))
      .join(broadcast(labels), $"uri" === labels("subject"))
      .groupBy($"_id")
      .agg(
        array_distinct(flatten(collect_list($"extLabels"))).as("matchedLabels"),
        array_distinct(flatten(collect_list($"extNormalized"))).as("matchedNormalized"))

  /** Matched external labels per id, probed from *fragments* — equivalent
    * to [[matchesFromDocs]] (only full URIs can ever match; the bare
    * segments added at doc build never do), but avoids consuming the
    * grouped docs twice: the probe runs pre-aggregation, so `docs` is
    * evaluated exactly once in [[ingestDocs]].
    */
  private def matchesFromFragments(fragments: DataFrame, labels: DataFrame): DataFrame =
    fragments
      .where($"kind" === "fast" && ($"sameAsViaf".isNotNull || $"sameAsLc".isNotNull))
      .select($"id".as("_id"), coalesce($"sameAsViaf", $"sameAsLc").as("uri"))
      .join(broadcast(labels), $"uri" === labels("subject"))
      .groupBy($"_id")
      .agg(
        array_distinct(flatten(collect_list($"extLabels"))).as("matchedLabels"),
        array_distinct(flatten(collect_list($"extNormalized"))).as("matchedNormalized"))

  private def applyMatches(docs: DataFrame, matches: DataFrame): DataFrame =
    docs
      .join(matches, Seq("_id"), "left")
      .select(
        $"_id", $"fast", $"type", $"prefLabel",
        sort_array(array_distinct(concat($"altLabel", coalesce($"matchedLabels", array()))))
          .as("altLabel"),
        $"sameAsLc", $"sameAsViaf",
        sort_array(array_distinct(concat($"normalized", coalesce($"matchedNormalized", array()))))
          .as("normalized"))

  /** A lazily-built op result plus the release handle for its cached
    * intermediate. The caller runs its ONE materializing action (typically
    * the sink write — the only full materialization on the path), then
    * calls [[release]]; any further action on [[result]] after release
    * recomputes from source. Harness paths that can't thread the handle
    * (Verify/Bench run `GraftSession.releaseAll` between queries) are
    * covered by that sweep instead.
    */
  final case class Staged(result: DataFrame, release: () => Unit)

  /** Term path end-to-end: lines → enriched docs.
    * `fragments` feeds three branches (docs, label table, enrichment probe)
    * and is persisted so the parse/project scan runs once; the enrichment
    * probe joins at fragment level, so the grouped docs are consumed
    * exactly once. (MEMORY_AND_DISK: at cluster scale the persist spills,
    * not OOMs.)
    *
    * LAZY: nothing runs until the caller's action — at 100 TB the sink
    * write is then the ONLY materialization of the result (round 7 eagerly
    * checkpointed here, doubling output I/O on the ingest path). The
    * fragments cache populates during that action and is freed via the
    * returned [[Staged]] handle once the action completes.
    */
  def ingestDocsStaged(lines: DataFrame, docType: Column): Staged = {
    val fragments = project(parse(lines))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Staged(
      applyMatches(
        buildDocs(fragments, docType),
        matchesFromFragments(fragments, sameAsLabels(fragments))),
      () => { fragments.unpersist(); () })
  }

  /** [[ingestDocsStaged]] without the handle — for harness/interactive
    * call-sites whose storage is swept externally
    * ([[graft.GraftSession.releaseAll]]).
    */
  def ingestDocs(lines: DataFrame, docType: Column): DataFrame =
    ingestDocsStaged(lines, docType).result

  /** P4 — agent records: otherId = trailing segment of the sameAs link, LC
    * link preferred (`lib/ingest.js:217-228`); linkless fragments dropped.
    */
  def agentOtherIds(fragments: DataFrame): DataFrame =
    fragments
      .where($"kind" === "fast" &&
        ($"sameAsLc".isNotNull || $"sameAsViaf".isNotNull) && $"id".isNotNull)
      .select($"id",
        coalesce(Nt.lastSegment($"sameAsLc"), Nt.lastSegment($"sameAsViaf")).as("otherId"))

  /** J2/K4 — the VIAF lookup-update, one declarative pass instead of a
    * read-modify-write per triple (`lib/ingest.js:106-130,212-232`):
    * group agent fast-ids per otherId, UNPIVOT the viaf keys
    * (`explode(array(viaf, lcId))`) so the disjunctive match is ONE
    * equi-join — both sides stay hash-joinable at scale (no
    * BroadcastNestedLoop) and the agent side is consumed exactly once, so
    * the op needs no persist and stays fully LAZY: the caller's sink write
    * is the only materialization (round 7 checkpointed eagerly here,
    * doubling output I/O). The unpivot doubles viaf-side *key* rows only —
    * a two-column projection, not the payload. Keep the first match per
    * otherId (min `_id`, the deterministic stand-in for Mongo's
    * `results[0]`), then array-union the fast ids into the matched rows.
    *
    * `viaf` schema: _id STRING, viaf STRING, lcId STRING, fast ARRAY<INT>.
    * Returns the full updated viaf table (unmatched rows unchanged).
    */
  /** `broadcastViaf = true` (default): authority tables are
    * dimension-sized, so the unpivoted key table rides a broadcast and
    * the match happens MAP-SIDE over the raw fragment stream — only
    * MATCHED fragments reach the one (otherId) exchange, which both
    * removes the former pre-aggregation exchange and its sort-aggregate
    * first() pass (r16: 1.8 → 1.5 s at sf0.1) and shrinks the shuffle
    * payload by the match selectivity at any scale. Set false for an
    * authority table too large to broadcast: the planner then
    * shuffle-joins, and the (otherId) aggregation still bounds the
    * exchange by distinct matched keys.
    */
  def viafUpdate(agents: DataFrame, viaf: DataFrame,
                 broadcastViaf: Boolean = true): DataFrame = {
    val viafKeys0 = viaf
      .select($"_id".as("v_id"), explode(array($"viaf", $"lcId")).as("vkey"))
      .where($"vkey".isNotNull)
    val viafKeys = if (broadcastViaf) broadcast(viafKeys0) else viafKeys0
    // match BEFORE aggregating, then ONE (otherId) aggregation computes
    // both the winner (min _id — the deterministic stand-in for Mongo's
    // results[0]) and the id set; duplicate id rows from an otherId
    // matching both keys of one viaf row collapse in collect_set
    val am = agents.join(viafKeys, $"otherId" === $"vkey")
      .groupBy($"otherId")
      .agg(min($"v_id").as("v_id"), collect_set($"id").as("newFast"))
    val perViaf = am
      .groupBy($"v_id")
      .agg(array_distinct(flatten(collect_list($"newFast"))).as("addFast"))
    val perViafB = if (broadcastViaf) broadcast(perViaf) else perViaf
    viaf
      .join(perViafB, viaf("_id") === perViaf("v_id"), "left")
      .select(viaf("_id"), $"viaf", $"lcId",
        when($"addFast".isNotNull,
          sort_array(array_distinct(concat(coalesce($"fast", array()), $"addFast"))))
          .otherwise($"fast").as("fast"))
  }

  private implicit class Interp(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.parts.mkString)
  }
}
