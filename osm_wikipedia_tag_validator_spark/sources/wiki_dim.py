"""The validator ⇄ wiki-entity-cache boundary, made explicit.

The reference resolves wikipedia/wikidata state through per-row cached
network calls into wikibrain (`script.py:329`,
`generate_webpage_with_error_output.py` passim). This engine replaces
that with ONE dimension table joined four ways
(`operators.validator.join_wiki_entities`): on the wikipedia article,
on the wikidata qid, on the redirect target, and on the out-of-pair
secondary wikidata value. This module is the contract for that table —
any real backing source (a wikidata JSON dump, a WDQS extract, a
wikibrain cache export) plugs into the validator by being normalized
through :func:`build_wiki_entities_dim`.

Column contract — what the validator consumes, and which reference
check each column feeds:

``qid`` (string)
    Join key for wikidata tags and for the secondary-existence /
    redirect-target self-lookups.
``article`` (string)
    ``lang:Title`` sitelink of the entity's home wiki; join key for
    wikipedia tags (reference resolves titles via
    ``generate_webpage_with_error_output.py:589`` wikibrain calls).
``lang`` (string)
    Language of `article`; feeds the language-preference family
    ("wikipedia tag in outdated language", preferred-language sitelink
    swaps).
``exists`` (boolean)
    Entity/article resolves (False → the 404 family: "wikipedia tag
    links to 404", "wikidata tag links to 404", and via the `sec`
    self-join "secondary wikidata tag links to 404").
``redirect_to`` (string, nullable)
    Target qid when the entity/article is a redirect → "wikipedia tag
    links to a redirect", "wikidata tag links to a redirect", and the
    mismatch-follow-redirect pair
    (`generate_webpage_with_error_output.py:859`).
``is_disambiguation`` (boolean)
    Instance-of disambiguation class → "link to a disambiguation page"
    (`generate_webpage_with_error_output.py:874`).
``instance_of`` (string)
    Entity class; membership in `error_catalog.SECONDARY_TARGETS`
    routes the ~800 "should use secondary wikipedia tag" classes, and
    the phrase dim joined in `join_wiki_entities` renders the human
    description.
``sitelinks`` (map<string,string>)
    lang → article for every wiki the entity links; feeds the
    language-preference rules (is there a sitelink in the region's
    `language_code`?) and redirect-resolution of proposed changes.
``lat``/``lon`` (double, nullable) + ``has_coord`` (boolean)
    Wikidata P625 coordinate; feeds "wikidata location mismatch"
    distance checks.

The deterministic synthetic generator
(`datagen.world.gen_wiki_entities` / `spark_wiki_entities`) is the
reference implementation of a source producing this contract; the
driver-gate golden `spatial_error_reports` pins the validator's output
over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

#: columns `operators.validator` actually reads from the dim — the
#: minimal surface a real source must provide. Kept in one place so the
#: validator's malformed-input assert and any normalizer agree.
CONSUMED_COLUMNS: dict[str, str] = {
    "qid": "string",
    "article": "string",
    "lang": "string",
    "exists": "boolean",
    "redirect_to": "string",
    "is_disambiguation": "boolean",
    "instance_of": "string",
    "sitelinks": "map<string,string>",
    "lat": "double",
    "lon": "double",
    "has_coord": "boolean",
}

WIKI_DIM_SCHEMA = ", ".join(f"{c} {t}" for c, t in CONSUMED_COLUMNS.items())


def build_wiki_entities_dim(
    raw_wiki: DataFrame, column_map: dict[str, str] | None = None
) -> DataFrame:
    """Normalize a raw wiki-entity table into the validator's dim.

    - `column_map` renames source columns to contract names
      (e.g. ``{"id": "qid", "enwiki_title": "article"}``).
    - missing REQUIRED columns fail fast with the full contract in the
      message (the P11 malformed-config assert applied to this
      boundary); missing OPTIONAL columns (`lat`/`lon`/`has_coord`) are
      filled as absent-coordinate.
    - every column is cast to its contract type (a dump with int qids
      or string booleans still normalizes).
    - exactly one row per qid, deterministically: duplicates keep the
      lexicographically-smallest (article, lang) so repeated builds —
      and therefore golden fixtures — are stable regardless of source
      ordering.

    The result is driver-side-small by design (the validator broadcasts
    four projections of it); a source that is NOT small must be
    pre-filtered to the qids/articles referenced by the elements under
    validation before being handed here — that semi-join is the
    source's contract, not the validator's.
    """
    df = raw_wiki
    for src, dst in (column_map or {}).items():
        df = df.withColumnRenamed(src, dst)

    have = set(df.columns)
    required = [c for c in CONSUMED_COLUMNS if c not in ("lat", "lon", "has_coord")]
    missing = [c for c in required if c not in have]
    if missing:
        raise ValueError(
            f"wiki entity source is missing required columns {missing}; "
            f"the validator consumes: {WIKI_DIM_SCHEMA}"
        )
    if "lat" not in have:
        df = df.withColumn("lat", F.lit(None).cast("double"))
    if "lon" not in have:
        df = df.withColumn("lon", F.lit(None).cast("double"))
    if "has_coord" not in have:
        df = df.withColumn("has_coord", F.col("lat").isNotNull() & F.col("lon").isNotNull())

    dim = df.select(
        *[F.col(c).cast(t).alias(c) for c, t in CONSUMED_COLUMNS.items()]
    )
    w = Window.partitionBy("qid").orderBy(
        F.asc_nulls_last("article"), F.asc_nulls_last("lang")
    )
    return (
        dim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assert_wiki_dim(wiki: DataFrame) -> DataFrame:
    """Cheap plan-side contract check used by the validator: all
    consumed columns present (types are the source's responsibility via
    `build_wiki_entities_dim`). Returns the input unchanged."""
    missing = [c for c in CONSUMED_COLUMNS if c not in set(wiki.columns)]
    if missing:
        raise ValueError(
            f"wiki dim is missing columns {missing} — normalize the source "
            f"with sources.wiki_dim.build_wiki_entities_dim (contract: "
            f"{WIKI_DIM_SCHEMA})"
        )
    return wiki
