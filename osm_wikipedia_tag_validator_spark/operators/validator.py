"""The validator — reference's core per-row UDF as a Catalyst plan.

Reference: `update_problem_for_entry` (`script.py:318-347`) calls
`get_the_most_important_problem_generic(tags, location, type, id)` per
row in a Python loop (`script.py:304-315`), hitting a networked wiki
cache per element. Here the wiki lookups become three JOINS against the
`wiki_entities` dim table and the rule cascade becomes a priority-
ordered `F.when` chain — whole-stage-codegen JVM expressions, zero
Python in the hot path (beats even a pandas UDF).

Rule priority mirrors "most important problem" selection: the first
matching rule wins, and the ORDER IS DATA-DRIVEN — `RULE_PRIORITIES`
below is the single source both for the cascade order and for the
generated error catalog (`CATALOG`/`catalog_rows()`), the engine's
analog of the reference's routing list builders
(`generate_webpage_with_error_output.py:277-1081`: obvious_fixes
:277-333, for_review :335-540, for_tests :542-670, ignored :672-1081 —
which likewise GENERATE ids programmatically: "should use a secondary
wikipedia tag - linking from {wikipedia|wikidata|wikipedia and
wikidata} tag to a {class}", "malformed secondary wikidata tag - for
{prefix} prefixed tags", ...).

The tri-state complaint of the reference (`database.py:9-14`: NULL =
unchecked, '' = clean, JSON = error) is promoted to a typed `status`
enum + report struct (SURVEY.md §1.1).

Output adds columns:
  error_id       string (NULL = clean)
  status         'error' | 'clean'   (unchecked rows simply aren't here)
  suppressed     boolean — error class is region-ignored; the row STAYS
                 (reference keeps it and skips only the report,
                 `script.py:309-313`); report sinks filter on this
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

# instance-of class → the article-class phrase used in the generated
# error id, reference format `generate_webpage_with_error_output.py:
# 345-420` ("should use a secondary wikipedia tag - linking from
# <from_tags> tag to <phrase>")
SECONDARY_CLASS_PHRASES = {
    "human": "a human",
    "brand": "a brand",
    "battle": "a battle",
    "given name": "a given name",
    "taxon": "an animal or plant (and not an individual one)",
    "event": "a historical event",
}

# experimental secondary classes the reference quarantines to the tests
# page (`generate_webpage_with_error_output.py:542-670` — same id
# format, routed to `for_tests` instead of `for_review`); a
# representative slice of those families
SECONDARY_CLASS_PHRASES_TESTS = {
    "aircraft crash": "an aircraft crash",
    "signage": "a signage",
    "science": "a science",
    "human behavior": "a human behavior",
    "belief": "a belief",
    "form of art": "a form of art",
}

# language-preference machinery (reference detector ctor
# `script.py:350-358`: `expected_language_code` +
# `languages_ordered_by_preference=[language_code]`; wrong-language
# family `generate_webpage_with_error_output.py:277-293,486-493`).
# Canonical wikipedia language codes the engine recognizes — datagen
# mirrors this list; on a cluster this is the full sitematrix.
KNOWN_WIKIPEDIA_LANGS = ["en", "de", "pl", "fr", "es"]
# code aliases resolved to a canonical wikipedia (reference class
# "wikipedia tag using redirecting language code"); ISO 639-2 → 639-1
LANG_CODE_REDIRECTS = {
    "eng": "en",
    "ger": "de",
    "pol": "pl",
    "fra": "fr",
    "spa": "es",
}

_FROM_TAGS = ["wikipedia and wikidata", "wikipedia", "wikidata"]

# secondary-key prefixes (reference: "malformed secondary wikipedia tag
# - for {prefix} prefixed tags", `generate_webpage…py:437-455,500-530`)
_SECONDARY_WP_PREFIXES = [
    k.removesuffix(":wikipedia") for k in PRIMARY_WIKIPEDIA_KEYS if k != "wikipedia"
]
_SECONDARY_WD_PREFIXES = [k.removesuffix(":wikidata") for k in SECONDARY_WIKIDATA_KEYS]

# ---------------------------------------------------------------------------
# The routing catalog — single source for cascade order AND category
# routing. (family, category, [error ids]) in priority order; the
# datagen dim table and the report sinks both derive from this.
# ---------------------------------------------------------------------------

RULE_PRIORITIES: dict[str, int] = {
    "malformed_wikipedia": 0,
    "malformed_secondary_wikipedia": 1,
    "malformed_wikidata": 2,
    "malformed_secondary_wikidata": 3,
    "old_style_wikipedia": 4,
    # language-code diagnoses must precede 404: an aliased/unknown code
    # never joins the entity dim, so without them the row would
    # misreport as a 404
    "nonexisting_lang_code": 5,
    "lang_code_redirect": 6,
    "wikipedia_404": 7,
    "wikidata_404": 8,
    "secondary_wikidata_404": 9,
    "mismatch_follow_wikipedia_redirect": 10,
    "mismatch_follow_wikidata_redirect": 11,
    "mismatch": 12,
    "wikidata_redirect": 13,
    "wikipedia_redirect": 14,
    "wikipedia_disambig": 15,
    "secondary_class": 16,
    # the fixable refinement outranks the generic wrong-language id
    "wrong_language_fixable": 17,
    "wrong_language": 18,
    # tag-completion families (reference obvious_fixes 'wikidata from
    # wikipedia tag' / 'wikipedia from wikidata tag[, unexpected
    # language]') — gated by classify(request_missing_tags=...)
    "wikidata_from_wikipedia": 19,
    "wikipedia_from_wikidata": 20,
    "wikipedia_from_wikidata_lang": 21,
    "outside_region": 22,
}


def catalog_rows() -> list[tuple[str, str, int, str]]:
    """(error_id, category, priority, family) — every concrete error id
    the cascade can emit, generated like the reference's list builders.
    Category semantics: obvious = bot-fixable with a proposed change,
    review = human page, tests = experimental page, ignored = never
    rendered (`generate_webpage_with_error_output.py:277-1081`)."""
    P = RULE_PRIORITIES
    rows: list[tuple[str, str, int, str]] = [
        ("malformed wikipedia tag", "review", P["malformed_wikipedia"], "malformed_wikipedia"),
        ("malformed wikidata tag", "review", P["malformed_wikidata"], "malformed_wikidata"),
        ("invalid old-style wikipedia tag", "review", P["old_style_wikipedia"], "old_style_wikipedia"),
        ("wikipedia tag links to 404", "review", P["wikipedia_404"], "wikipedia_404"),
        ("wikidata tag links to 404", "review", P["wikidata_404"], "wikidata_404"),
        ("secondary wikidata tag links to 404", "review", P["secondary_wikidata_404"], "secondary_wikidata_404"),
        ("wikipedia wikidata mismatch - follow wikipedia redirect", "obvious",
         P["mismatch_follow_wikipedia_redirect"], "mismatch_follow_wikipedia_redirect"),
        ("wikipedia wikidata mismatch - follow wikidata redirect", "obvious",
         P["mismatch_follow_wikidata_redirect"], "mismatch_follow_wikidata_redirect"),
        ("wikipedia wikidata mismatch", "review", P["mismatch"], "mismatch"),
        ("wikidata tag links to a redirect", "obvious", P["wikidata_redirect"], "wikidata_redirect"),
        ("wikipedia tag links to a redirect", "obvious", P["wikipedia_redirect"], "wikipedia_redirect"),
        ("wikipedia tag links to a disambiguation page", "tests", P["wikipedia_disambig"], "wikipedia_disambig"),
        ("malformed wikipedia tag - nonexisting language code", "review",
         P["nonexisting_lang_code"], "nonexisting_lang_code"),
        ("wikipedia tag using redirecting language code", "obvious",
         P["lang_code_redirect"], "lang_code_redirect"),
        ("wikipedia tag in unexpected language, good one in expected language found",
         "obvious", P["wrong_language_fixable"], "wrong_language_fixable"),
        ("wikipedia tag unexpected language", "review", P["wrong_language"], "wrong_language"),
        ("wikidata from wikipedia tag", "obvious",
         P["wikidata_from_wikipedia"], "wikidata_from_wikipedia"),
        ("wikipedia from wikidata tag", "obvious",
         P["wikipedia_from_wikidata"], "wikipedia_from_wikidata"),
        ("wikipedia from wikidata tag, unexpected language", "obvious",
         P["wikipedia_from_wikidata_lang"], "wikipedia_from_wikidata_lang"),
        ("element outside declared region", "review", P["outside_region"], "outside_region"),
        # routed-but-never-rendered class (reference `ignored()` list)
        ("wikipedia tag in outdated form", "ignored", 99, "legacy"),
    ]
    for from_tags in _FROM_TAGS:
        for phrase in SECONDARY_CLASS_PHRASES_TESTS.values():
            rows.append((
                f"should use a secondary wikipedia tag - linking from {from_tags} tag to {phrase}",
                "tests", P["secondary_class"], "secondary_class",
            ))
    for pfx in _SECONDARY_WP_PREFIXES:
        rows.append((
            f"malformed secondary wikipedia tag - for {pfx} prefixed tags",
            "review", P["malformed_secondary_wikipedia"], "malformed_secondary_wikipedia",
        ))
    for pfx in _SECONDARY_WD_PREFIXES:
        rows.append((
            f"malformed secondary wikidata tag - for {pfx} prefixed tags",
            "review", P["malformed_secondary_wikidata"], "malformed_secondary_wikidata",
        ))
    for from_tags in _FROM_TAGS:
        for phrase in SECONDARY_CLASS_PHRASES.values():
            rows.append((
                f"should use a secondary wikipedia tag - linking from {from_tags} tag to {phrase}",
                "review", P["secondary_class"], "secondary_class",
            ))
    return rows


def extract_wiki_tags(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Pull the wikipedia/wikidata payloads out of the tag map.

    Mirrors the relevance filter's substring semantics
    (`load_osm_file.py:17-21`): any key containing 'wikipedia' or
    'wikidata' makes the element relevant; the canonical keys above are
    the ones validated. Also captures WHICH key supplied each payload
    (primary vs secondary routing needs it) and any old-style
    `wikipedia:<lang>` key (reference 'invalid old-style wikipedia
    tag').
    """
    t = F.col(tags_col)
    wp = F.coalesce(*[t.getItem(k) for k in PRIMARY_WIKIPEDIA_KEYS])
    old_keys = F.filter(
        F.map_keys(t), lambda k: k.rlike("^wikipedia:[a-z]{2,3}$")
    )
    old_key = F.array_min(old_keys)
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
        F.coalesce(
            F.when(t.getItem("wikidata").isNotNull(), F.lit("wikidata")),
            *[F.when(t.getItem(k).isNotNull(), F.lit(k)) for k in SECONDARY_WIKIDATA_KEYS],
        ).alias("used_wikidata_key"),
        old_key.alias("old_style_wikipedia_key"),
        F.when(old_key.isNotNull(), t.getItem(old_key)).alias("old_style_wikipedia_value"),
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
    (`script.py:329`) as three broadcast joins — on the wikipedia
    article, on the wikidata qid, and on the wikipedia redirect target
    (to resolve the redirect's article for proposed changes)."""
    wp = F.broadcast(
        wiki.select(
            F.col("article").alias("wikipedia_tag"),
            F.col("qid").alias("wp_qid"),
            F.col("exists").alias("wp_exists"),
            F.col("redirect_to").alias("wp_redirect_to"),
            F.col("is_disambiguation").alias("wp_is_disambiguation"),
            F.col("instance_of").alias("wp_instance_of"),
            F.col("sitelinks").alias("wp_sitelinks"),
        )
    )
    wd = F.broadcast(
        wiki.select(
            F.col("qid").alias("wikidata_tag"),
            F.col("exists").alias("wd_exists"),
            F.col("redirect_to").alias("wd_redirect_to"),
            F.col("is_disambiguation").alias("wd_is_disambiguation"),
            F.col("instance_of").alias("wd_instance_of"),
            F.col("sitelinks").alias("wd_sitelinks"),
        )
    )
    redir = F.broadcast(
        wiki.select(
            F.col("qid").alias("wp_redirect_to"),
            F.col("article").alias("wp_redirect_article"),
        )
    )
    return (
        elements.join(wp, "wikipedia_tag", "left")
        .join(wd, "wikidata_tag", "left")
        .join(redir, "wp_redirect_to", "left")
    )


def _phrase_map_col() -> Column:
    kv: list[Column] = []
    for inst, phrase in {**SECONDARY_CLASS_PHRASES, **SECONDARY_CLASS_PHRASES_TESTS}.items():
        kv.extend([F.lit(inst), F.lit(phrase)])
    return F.create_map(*kv)


def _lang_redirect_map_col() -> Column:
    kv: list[Column] = []
    for alias, target in LANG_CODE_REDIRECTS.items():
        kv.extend([F.lit(alias), F.lit(target)])
    return F.create_map(*kv)


def build_rules(
    region_lang_col: str = "language_code",
    inside_region_col: str | None = "inside_declared_region",
    request_missing_tags: bool = False,
) -> dict[str, tuple[Column, Column]]:
    """family → (condition, error_id expression). Families with
    GENERATED ids (secondary classes, prefixed malformed variants)
    compute the id from row data — same shape as the reference's
    string-building list generators."""
    wp = F.col("wikipedia_tag")
    wd = F.col("wikidata_tag")
    has_wp = wp.isNotNull()
    has_wd = wd.isNotNull()
    used_wp = F.col("used_primary_wikipedia_key")
    used_wd = F.col("used_wikidata_key")
    wp_primary = used_wp == "wikipedia"
    wd_plain = used_wd == "wikidata"
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
    # secondary-class rule fires only for PRIMARY tag links — a
    # brand:wikipedia → brand article is CORRECT secondary usage
    from_wp = has_wp & ~wp_malformed & ~wp_404 & wp_primary
    from_wd = has_wd & ~wd_malformed & ~wd_404 & wd_plain
    inst = F.coalesce(
        F.when(from_wp, F.col("wp_instance_of")),
        F.when(from_wd, F.col("wd_instance_of")),
    )
    # try_element_at: plain element_at throws on a missing map key under
    # ANSI mode; a non-secondary instance_of (place/generic/NULL) must
    # simply yield NULL
    phrase = F.try_element_at(_phrase_map_col(), inst)
    from_desc = (
        F.when(from_wp & from_wd, "wikipedia and wikidata")
        .when(from_wp, "wikipedia")
        .otherwise("wikidata")
    )
    secondary_class = (from_wp | from_wd) & phrase.isNotNull()
    # language-preference machinery (reference `script.py:350-358`:
    # `languages_ordered_by_preference=[language_code]` — the region's
    # single preferred language, which is what region_lang_col carries)
    lang = F.col("wikipedia_lang")
    lang_known = lang.isin(*KNOWN_WIKIPEDIA_LANGS)
    lang_alias = lang.isin(*LANG_CODE_REDIRECTS.keys())
    wp_shape_ok = has_wp & ~wp_malformed
    wrong_lang = (
        wp_shape_ok
        & F.col(region_lang_col).isNotNull()
        & (lang != F.col(region_lang_col))
    )
    # a sitelink in the region's preferred language makes the wrong-
    # language complaint bot-fixable (reference obvious_fixes class)
    preferred_sitelink = F.try_element_at(
        F.col("wp_sitelinks"), F.col(region_lang_col)
    )
    wrong_lang_fixable = wrong_lang & preferred_sitelink.isNotNull()

    def _lit(s: str) -> Column:
        return F.lit(s)

    rules: dict[str, tuple[Column, Column]] = {
        "malformed_wikipedia": (wp_malformed & wp_primary, _lit("malformed wikipedia tag")),
        "malformed_secondary_wikipedia": (
            wp_malformed & ~wp_primary,
            F.concat(
                F.lit("malformed secondary wikipedia tag - for "),
                F.regexp_replace(used_wp, ":wikipedia$", ""),
                F.lit(" prefixed tags"),
            ),
        ),
        "malformed_wikidata": (wd_malformed & wd_plain, _lit("malformed wikidata tag")),
        "malformed_secondary_wikidata": (
            wd_malformed & ~wd_plain,
            F.concat(
                F.lit("malformed secondary wikidata tag - for "),
                F.regexp_replace(used_wd, ":wikidata$", ""),
                F.lit(" prefixed tags"),
            ),
        ),
        "old_style_wikipedia": (
            F.col("old_style_wikipedia_key").isNotNull(),
            _lit("invalid old-style wikipedia tag"),
        ),
        "wikipedia_404": (wp_404, _lit("wikipedia tag links to 404")),
        "wikidata_404": (wd_404 & wd_plain, _lit("wikidata tag links to 404")),
        "secondary_wikidata_404": (
            wd_404 & ~wd_plain, _lit("secondary wikidata tag links to 404")
        ),
        "mismatch_follow_wikipedia_redirect": (
            mismatch & F.col("wp_redirect_to").eqNullSafe(wd),
            _lit("wikipedia wikidata mismatch - follow wikipedia redirect"),
        ),
        "mismatch_follow_wikidata_redirect": (
            mismatch & F.col("wd_redirect_to").eqNullSafe(F.col("wp_qid")),
            _lit("wikipedia wikidata mismatch - follow wikidata redirect"),
        ),
        "mismatch": (mismatch, _lit("wikipedia wikidata mismatch")),
        "wikidata_redirect": (wd_redirect, _lit("wikidata tag links to a redirect")),
        "wikipedia_redirect": (wp_redirect, _lit("wikipedia tag links to a redirect")),
        "wikipedia_disambig": (
            wp_disambig, _lit("wikipedia tag links to a disambiguation page")
        ),
        "secondary_class": (
            secondary_class,
            F.concat(
                F.lit("should use a secondary wikipedia tag - linking from "),
                from_desc,
                F.lit(" tag to "),
                phrase,
            ),
        ),
        "nonexisting_lang_code": (
            wp_shape_ok & ~lang_known & ~lang_alias,
            _lit("malformed wikipedia tag - nonexisting language code"),
        ),
        "lang_code_redirect": (
            wp_shape_ok & lang_alias,
            _lit("wikipedia tag using redirecting language code"),
        ),
        "wrong_language_fixable": (
            wrong_lang_fixable,
            _lit("wikipedia tag in unexpected language, good one in expected language found"),
        ),
        "wrong_language": (wrong_lang, _lit("wikipedia tag unexpected language")),
    }
    if request_missing_tags:
        # tag-completion families (reference obvious_fixes
        # `generate_webpage_with_error_output.py:282-286`): propose the
        # missing twin tag from what the entity dim already knows. Off
        # by default so the baseline cascade (and its golden fixtures)
        # only complains about tags that are PRESENT and wrong.
        region_sitelink = F.try_element_at(
            F.col("wd_sitelinks"), F.col(region_lang_col)
        )
        any_sitelink = F.col("wd_sitelinks").isNotNull() & (
            F.size(F.map_keys(F.col("wd_sitelinks"))) > 0
        )
        rules["wikidata_from_wikipedia"] = (
            from_wp & ~has_wd & F.col("wp_qid").isNotNull(),
            _lit("wikidata from wikipedia tag"),
        )
        rules["wikipedia_from_wikidata"] = (
            ~has_wp & from_wd & region_sitelink.isNotNull(),
            _lit("wikipedia from wikidata tag"),
        )
        rules["wikipedia_from_wikidata_lang"] = (
            ~has_wp & from_wd & region_sitelink.isNull() & any_sitelink,
            _lit("wikipedia from wikidata tag, unexpected language"),
        )
    if inside_region_col is not None:
        rules["outside_region"] = (
            ~F.coalesce(F.col(inside_region_col), F.lit(True)),
            _lit("element outside declared region"),
        )
    return rules


def classify(df: DataFrame, region_lang_col: str = "language_code",
             inside_region_col: str | None = "inside_declared_region",
             priorities: dict[str, int] | None = None,
             request_missing_tags: bool = False) -> DataFrame:
    """Priority-ordered rule cascade → error_id (NULL = clean).

    The cascade ORDER comes from `priorities` (default
    `RULE_PRIORITIES`, the same table the error catalog is generated
    from) — "most important problem" selection is data, not code
    structure."""
    priorities = priorities or RULE_PRIORITIES
    rules = build_rules(region_lang_col, inside_region_col, request_missing_tags)
    ordered = sorted(rules.items(), key=lambda kv: priorities.get(kv[0], 10_000))
    cascade: Column | None = None
    for _fam, (cond, err) in ordered:
        cascade = F.when(cond, err) if cascade is None else cascade.when(cond, err)
    assert cascade is not None
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
    validator_complaint JSON, `script.py:331-347`, as a StructType).

    F13 proposed-change extraction, full form
    (`generate_webpage_with_error_output.py:216-234`, bot copy
    `osm_editor_bot_for_approved_tasks.py:85-95`): every obvious-fix
    class carries a from/to tag-map pair —

      wikidata redirect (plain or mismatch-confirmed) →
          {used wikidata key: Qold} → {key: Qtarget}
      wikipedia redirect (plain or mismatch-confirmed) →
          {used wikipedia key: old article} → {key: redirect article}
      invalid old-style wikipedia tag →
          {wikipedia:<lang>: Article} → {wikipedia: <lang>:Article}
    """
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
    err = F.col("error_id")
    used_wd = F.col("used_wikidata_key")
    used_wp = F.col("used_primary_wikipedia_key")
    old_key = F.col("old_style_wikipedia_key")
    old_val = F.col("old_style_wikipedia_value")

    def _change(key: Column, frm: Column, to: Column, to_key: Column | None = None) -> Column:
        return F.array(
            F.struct(
                F.create_map(key, frm).alias("from"),
                F.create_map(to_key if to_key is not None else key, to).alias("to"),
            )
        )

    changes = (
        F.when(
            err.isin(
                "wikidata tag links to a redirect",
                "wikipedia wikidata mismatch - follow wikidata redirect",
            ),
            _change(used_wd, F.col("wikidata_tag"), F.col("wd_redirect_to")),
        )
        .when(
            err.isin(
                "wikipedia tag links to a redirect",
                "wikipedia wikidata mismatch - follow wikipedia redirect",
            )
            & F.col("wp_redirect_article").isNotNull(),
            _change(used_wp, F.col("wikipedia_tag"), F.col("wp_redirect_article")),
        )
        .when(
            err == "invalid old-style wikipedia tag",
            _change(
                old_key,
                old_val,
                F.concat(F.regexp_replace(old_key, "^wikipedia:", ""), F.lit(":"), old_val),
                to_key=F.lit("wikipedia"),
            ),
        )
        .when(
            err == "wikipedia tag using redirecting language code",
            _change(
                used_wp,
                F.col("wikipedia_tag"),
                F.concat(
                    F.element_at(_lang_redirect_map_col(), F.col("wikipedia_lang")),
                    F.lit(":"),
                    F.col("wikipedia_article"),
                ),
            ),
        )
        .when(
            err
            == "wikipedia tag in unexpected language, good one in expected language found",
            _change(
                used_wp,
                F.col("wikipedia_tag"),
                F.try_element_at(F.col("wp_sitelinks"), F.col("language_code")),
            ),
        )
        .when(
            err == "wikidata from wikipedia tag",
            F.array(
                F.struct(
                    F.create_map().cast("map<string,string>").alias("from"),
                    F.create_map(F.lit("wikidata"), F.col("wp_qid")).alias("to"),
                )
            ),
        )
        .when(
            err == "wikipedia from wikidata tag",
            F.array(
                F.struct(
                    F.create_map().cast("map<string,string>").alias("from"),
                    F.create_map(
                        F.lit("wikipedia"),
                        F.try_element_at(F.col("wd_sitelinks"), F.col("language_code")),
                    ).alias("to"),
                )
            ),
        )
        .when(
            err == "wikipedia from wikidata tag, unexpected language",
            F.array(
                F.struct(
                    F.create_map().cast("map<string,string>").alias("from"),
                    F.create_map(
                        F.lit("wikipedia"),
                        # deterministic pick among available sitelinks
                        F.array_min(F.map_values(F.col("wd_sitelinks"))),
                    ).alias("to"),
                )
            ),
        )
    )
    msg = F.concat(err, F.lit(" for "), url)
    report = F.when(
        err.isNotNull(),
        F.struct(
            err.alias("error_id"),
            msg.alias("error_message"),
            prereq.alias("prerequisite"),
            changes.alias("proposed_tagging_changes"),
            url.alias("osm_object_url"),
        ),
    )
    return df.select("*", url.alias("osm_object_url"), report.alias("report"))


def proposed_wikipedia_target(df: DataFrame, report_col: str = "report") -> DataFrame:
    """`current_wikipedia_target` / `desired_wikipedia_target`
    (`generate_webpage_with_error_output.py:216-234`): scan the
    proposed changes for the (at most one) replacement whose to-map
    touches the `wikipedia` tag. The reference raises ValueError on
    multiple replacements; here `assert_true` fails the job the same
    way (tested)."""
    changes = F.coalesce(
        F.col(f"{report_col}.proposed_tagging_changes"),
        F.array().cast(
            "array<struct<from:map<string,string>,to:map<string,string>>>"
        ),
    )
    wp_changes = F.filter(changes, lambda ch: ch["to"].getItem("wikipedia").isNotNull())
    guard = F.assert_true(
        F.size(wp_changes) <= 1,
        F.lit("multiple incoming replacements of the same tag"),
    )
    first = F.get(wp_changes, 0)
    return df.select(
        "*",
        F.when(guard.isNull(), first["from"].getItem("wikipedia")).alias(
            "current_wikipedia_target"
        ),
        F.when(guard.isNull(), first["to"].getItem("wikipedia")).alias(
            "desired_wikipedia_target"
        ),
    )


def validate(
    elements: DataFrame,
    wiki: DataFrame,
    regions: DataFrame,
    inside_region_col: str | None = None,
    request_missing_tags: bool = False,
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
        request_missing_tags=request_missing_tags,
    )
    marked = mark_ignored_problems(classified, regions)
    return build_report(marked)
