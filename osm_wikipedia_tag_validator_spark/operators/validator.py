"""The validator — reference's core per-row UDF as a Catalyst plan.

Reference: `update_problem_for_entry` (`script.py:318-347`) calls
`get_the_most_important_problem_generic(tags, location, type, id)` per
row in a Python loop (`script.py:304-315`), hitting a networked wiki
cache per element. Here the wiki lookups become two JOINS against the
`wiki_entities` dim table and the rule cascade becomes a priority-
ordered `F.when` chain — whole-stage-codegen JVM expressions, zero
Python in the hot path (beats even a pandas UDF).

Rule priority mirrors "most important problem" selection: the first
matching rule wins. The tri-state complaint of the reference
(`database.py:9-14`: NULL = unchecked, '' = clean, JSON = error) is
promoted to a typed `status` enum + report struct (SURVEY.md §1.1).

Output adds columns:
  error_id       string (NULL = clean)
  status         'error' | 'clean'   (unchecked rows simply aren't here)
  report         struct<error_id, error_message, prerequisite,
                        proposed_tagging_changes, osm_object_url>
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

PRIMARY_WIKIPEDIA_KEYS = ["wikipedia", "brand:wikipedia"]
SECONDARY_WIKIDATA_KEYS = ["subject:wikidata", "name:etymology:wikidata"]

REPORT_SCHEMA = (
    "struct<error_id:string,error_message:string,"
    "prerequisite:map<string,string>,"
    "proposed_tagging_changes:array<struct<from:map<string,string>,to:map<string,string>>>,"
    "osm_object_url:string>"
)


def extract_wiki_tags(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Pull the wikipedia/wikidata payloads out of the tag map.

    Mirrors the relevance filter's substring semantics
    (`load_osm_file.py:17-21`): any key containing 'wikipedia' or
    'wikidata' makes the element relevant; the canonical keys above are
    the ones validated.
    """
    t = F.col(tags_col)
    wp = F.coalesce(*[t.getItem(k) for k in PRIMARY_WIKIPEDIA_KEYS])
    # one select, not a withColumn chain — each withColumn re-analyzes
    # the whole plan and the flagship's driver-side planning cost is a
    # serial Amdahl term at high DOP
    return df.select(
        "*",
        wp.alias("wikipedia_tag"),
        F.coalesce(
            t.getItem("wikidata"), *[t.getItem(k) for k in SECONDARY_WIKIDATA_KEYS]
        ).alias("wikidata_tag"),
        F.coalesce(
            *[F.when(t.getItem(k).isNotNull(), F.lit(k)) for k in PRIMARY_WIKIPEDIA_KEYS]
        ).alias("used_primary_wikipedia_key"),
        F.get(F.split(wp, ":", 2), 0).alias("wikipedia_lang"),
        F.get(F.split(wp, ":", 2), 1).alias("wikipedia_article"),
    )


def relevance_filter(df: DataFrame, tags_col: str = "tags") -> Column:
    """P1/P2 (`load_osm_file.py:14-21`): non-empty tags and some key
    CONTAINS wikipedia/wikidata (substring match, not equality)."""
    return (F.size(tags_col) > 0) & F.exists(
        F.map_keys(tags_col),
        lambda k: k.contains("wikipedia") | k.contains("wikidata"),
    )


def join_wiki_entities(elements: DataFrame, wiki: DataFrame) -> DataFrame:
    """J1 (SURVEY §2.3): the reference's per-row cached network lookup
    (`script.py:329`) as two broadcast joins — one on the wikipedia
    article, one on the wikidata qid."""
    wp = F.broadcast(
        wiki.select(
            F.col("article").alias("wikipedia_tag"),
            F.col("qid").alias("wp_qid"),
            F.col("exists").alias("wp_exists"),
            F.col("redirect_to").alias("wp_redirect_to"),
            F.col("is_disambiguation").alias("wp_is_disambiguation"),
            F.col("instance_of").alias("wp_instance_of"),
        )
    )
    wd = F.broadcast(
        wiki.select(
            F.col("qid").alias("wikidata_tag"),
            F.col("exists").alias("wd_exists"),
            F.col("redirect_to").alias("wd_redirect_to"),
            F.col("is_disambiguation").alias("wd_is_disambiguation"),
            F.col("instance_of").alias("wd_instance_of"),
        )
    )
    return elements.join(wp, "wikipedia_tag", "left").join(wd, "wikidata_tag", "left")


def classify(df: DataFrame, region_lang_col: str = "language_code",
             inside_region_col: str | None = "inside_declared_region") -> DataFrame:
    """Priority-ordered rule cascade → error_id (NULL = clean)."""
    wp = F.col("wikipedia_tag")
    wd = F.col("wikidata_tag")
    has_wp = wp.isNotNull()
    has_wd = wd.isNotNull()
    wp_malformed = has_wp & ~wp.rlike("^[a-z]{2,3}:.+")
    wd_malformed = has_wd & ~wd.rlike("^Q[0-9]+$")
    wp_404 = has_wp & ~wp_malformed & (F.col("wp_qid").isNull() | ~F.col("wp_exists"))
    wd_404 = has_wd & ~wd_malformed & (F.col("wd_exists").isNull() | ~F.col("wd_exists"))
    mismatch = (
        has_wp
        & has_wd
        & ~wp_malformed
        & ~wd_malformed
        & ~wp_404
        & ~wd_404
        & (F.col("wp_qid") != wd)
    )
    wd_redirect = has_wd & ~wd_404 & ~wd_malformed & F.col("wd_redirect_to").isNotNull()
    wp_redirect = has_wp & ~wp_404 & ~wp_malformed & F.col("wp_redirect_to").isNotNull()
    wp_disambig = (
        has_wp & ~wp_404 & ~wp_malformed & F.coalesce("wp_is_disambiguation", F.lit(False))
    )
    linking_human = (
        (F.col("used_primary_wikipedia_key") == "wikipedia")
        & (F.coalesce("wp_instance_of", F.lit("")) == "human")
    )
    wrong_lang = (
        has_wp
        & ~wp_malformed
        & F.col(region_lang_col).isNotNull()
        & (F.col("wikipedia_lang") != F.col(region_lang_col))
    )
    cascade = (
        F.when(wp_malformed, "malformed wikipedia tag")
        .when(wd_malformed, "malformed wikidata tag")
        .when(wp_404, "wikipedia tag links to 404")
        .when(wd_404, "wikidata tag links to 404")
        .when(mismatch, "wikipedia wikidata mismatch")
        .when(wd_redirect, "wikidata tag links to a redirect")
        .when(wp_redirect, "wikipedia tag links to a redirect")
        .when(wp_disambig, "wikipedia tag links to a disambiguation page")
        .when(linking_human, "should use a secondary wikipedia tag - linking to a human")
        .when(wrong_lang, "wikipedia tag unexpected language")
    )
    if inside_region_col is not None:
        cascade = cascade.when(
            ~F.coalesce(F.col(inside_region_col), F.lit(True)),
            "element outside declared region",
        )
    return df.select(
        "*",
        cascade.alias("error_id"),
        F.when(cascade.isNotNull(), "error").otherwise("clean").alias("status"),
    )


def apply_ignored_problems(df: DataFrame, regions: DataFrame,
                           region_col: str = "area_identifier") -> DataFrame:
    """P8 (`script.py:195-200,309-313`): drop per-region ignored error
    classes — an anti-join against the exploded broadcast skip-list.

    REPORT-SINK-ONLY semantics: the reference keeps the row in its
    state table and merely `continue`s past it when rendering
    (`script.py:309-313`), so this anti-join must never run inside the
    state pipeline — use `mark_ignored_problems` there and filter on
    `suppressed` at the sinks."""
    skip = F.broadcast(
        regions.select(
            F.col("internal_region_name").alias(region_col),
            F.explode("ignored_problems").alias("error_id"),
        )
    )
    return df.join(skip, [region_col, "error_id"], "left_anti")


def mark_ignored_problems(df: DataFrame, regions: DataFrame,
                          region_col: str = "area_identifier") -> DataFrame:
    """P8, state-preserving form: adds `suppressed` (boolean) — true iff
    the row's error class is in its region's ignored_problems list. The
    row itself survives (the reference stores the complaint and skips
    it only at reporting time, `script.py:309-313`), so incremental
    state never loses these elements between rounds."""
    skip = F.broadcast(
        regions.select(
            F.col("internal_region_name").alias(region_col),
            F.explode("ignored_problems").alias("error_id"),
        ).withColumn("_suppressed", F.lit(True))
    )
    return (
        df.join(skip, [region_col, "error_id"], "left")
        .withColumn("suppressed", F.coalesce("_suppressed", F.lit(False)))
        .drop("_suppressed")
    )


def build_report(df: DataFrame) -> DataFrame:
    """Materialize the typed report struct (the reference's
    validator_complaint JSON, `script.py:331-347`, as a StructType)."""
    url = F.concat(
        F.lit("https://www.openstreetmap.org/"), F.col("type"), F.lit("/"), F.col("id")
    )
    prereq = F.map_filter(
        F.create_map(
            F.lit("wikipedia"), F.col("wikipedia_tag"),
            F.lit("wikidata"), F.col("wikidata_tag"),
        ),
        lambda k, v: v.isNotNull(),
    )
    # obvious-fix classes carry a proposed change (redirect follow)
    change_to = F.when(
        F.col("error_id") == "wikidata tag links to a redirect", F.col("wd_redirect_to")
    )
    changes = F.when(
        change_to.isNotNull(),
        F.array(
            F.struct(
                F.create_map(F.lit("wikidata"), F.col("wikidata_tag")).alias("from"),
                F.create_map(F.lit("wikidata"), change_to).alias("to"),
            )
        ),
    )
    msg = F.concat(F.col("error_id"), F.lit(" for "), url)
    report = F.when(
        F.col("error_id").isNotNull(),
        F.struct(
            F.col("error_id"),
            msg.alias("error_message"),
            prereq.alias("prerequisite"),
            changes.alias("proposed_tagging_changes"),
            url.alias("osm_object_url"),
        ),
    )
    return df.select("*", url.alias("osm_object_url"), report.alias("report"))


def validate(
    elements: DataFrame,
    wiki: DataFrame,
    regions: DataFrame,
    inside_region_col: str | None = None,
) -> DataFrame:
    """Full V1 pipeline: relevance filter → tag extract → entity joins →
    region-language join → cascade → ignored-problems MARK (not drop:
    suppressed rows stay in state, reference `script.py:309-313`) →
    report struct. Pure DataFrame ops; Catalyst broadcasts every dim.
    Report sinks filter on the `suppressed` column."""
    rel = elements.filter(relevance_filter(elements))
    tagged = extract_wiki_tags(rel)
    joined = join_wiki_entities(tagged, wiki)
    rdim = F.broadcast(
        regions.select(
            F.col("internal_region_name").alias("area_identifier"),
            "language_code",
            "hidden",
        )
    )
    with_lang = joined.join(rdim, "area_identifier", "left")
    classified = classify(
        with_lang,
        inside_region_col=inside_region_col,
    )
    marked = mark_ignored_problems(classified, regions)
    return build_report(marked)
