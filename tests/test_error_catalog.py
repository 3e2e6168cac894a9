"""Pure-data tests of the full routing inventory (no Spark session) —
`operators/error_catalog.py` + `validator.catalog_rows()` against the
reference's list shapes (`generate_webpage_with_error_output.py`:
obvious_fixes :277-333, for_review :335-540, for_tests :542-670,
ignored :672-1081)."""

from osm_wikipedia_tag_validator_spark.operators import validator as V
from osm_wikipedia_tag_validator_spark.operators.error_catalog import (
    CATEGORY_ORDER,
    PREFIXED_VARIANTS,
    SECONDARY_TARGETS,
    SINGLETON_IDS,
    instance_key,
    phrase_tables,
)


def test_inventory_shape():
    rows = V.catalog_rows()
    ids = [r[0] for r in rows]
    assert len(ids) == len(set(ids)), "catalog ids must be unique"
    assert len(ids) >= 800  # full reference inventory, not a slice
    by_cat = {}
    for _e, c, _p, _f in rows:
        by_cat[c] = by_cat.get(c, 0) + 1
    # reference scale: for_review 332, obvious 50, for_tests 146,
    # ignored 283 (before cross-list dedupe); ours adds a few engine
    # ids and dedupes in the reference's own check order
    assert by_cat["review"] >= 320
    assert by_cat["obvious"] >= 45
    assert by_cat["tests"] >= 135
    assert by_cat["ignored"] >= 270


def test_known_reference_ids_present_and_routed():
    routed = {r[0]: r[1] for r in V.catalog_rows()}
    # exact reference strings, one per generated shape + singletons
    assert routed["link to a disambiguation page"] == "review"
    assert (
        routed["should use a secondary wikipedia tag - linking from "
               "wikipedia and wikidata tag to a superstitution"] == "tests"
    )
    assert (
        routed["should use a secondary wikipedia tag - linking from "
               "wikidata tag to a music festival"] == "ignored"
    )
    assert routed["wikipedia wikidata mismatch - for sculptor prefixed tags"] == "tests"
    assert (
        routed["wikipedia wikidata mismatch - follow wikidata redirect - "
               "for brand prefixed tags"] == "obvious"
    )
    assert routed["malformed secondary wikipedia tag - for razed prefixed tags"] == "ignored"
    assert (
        routed["wikipedia wikidata mismatch - wikipedia points to disambiguation "
               "page and wikidata does not"] == "review"
    )
    assert (
        routed["something is wrong with wikipedia tag - fixme:wikipedia is present"]
        == "review"
    )
    assert (
        routed["information board with wikipedia tag, not subject:wikipedia"] == "review"
    )
    # cross-list dedupe follows the reference's note_unused_errors
    # check order: 'a religious denomination' is in BOTH for_review and
    # ignored targets — review wins
    assert (
        routed["should use a secondary wikipedia tag - linking from "
               "wikipedia tag to a religious denomination"] == "review"
    )


def test_phrase_tables_cover_all_targets():
    by_instance, category = phrase_tables()
    n_targets = len({p for ps in SECONDARY_TARGETS.values() for p in ps})
    assert len(category) == n_targets
    # legacy datagen keys still resolve
    assert by_instance["taxon"] == "an animal or plant (and not an individual one)"
    assert by_instance["event"] == "a historical event"
    assert by_instance["human"] == "a human"
    # derived keys strip the article
    assert instance_key("an aircraft crash") == "aircraft crash"
    assert by_instance["aircraft crash"] == "an aircraft crash"


def test_prefixed_variant_table_consistency():
    # every variant stem maps to a cascade family with a priority
    for stem in PREFIXED_VARIANTS:
        fam = V._VARIANT_FAMILY[stem]
        assert fam in V.RULE_PRIORITIES, fam
    # categories are the reference's four lists
    for stem, cats in PREFIXED_VARIANTS.items():
        assert set(cats) <= set(CATEGORY_ORDER), stem
    for cat in SINGLETON_IDS:
        assert cat in CATEGORY_ORDER
