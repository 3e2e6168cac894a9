"""The reference's full error-class routing inventory, as data.

The reference generates its routing lists programmatically
(`generate_webpage_with_error_output.py`: obvious_fixes :277-333,
for_review :335-540, for_tests :542-670, ignored :672-1081) from three
id shapes:

  1. "should use a secondary wikipedia tag - linking from
     {wikipedia|wikidata|wikipedia and wikidata} tag to {phrase}"
     — one phrase per wikidata instance-of class, x3 from-tag variants;
  2. "{variant} - for {prefix} prefixed tags" — six mismatch/malformed
     variant stems x a per-variant prefix set;
  3. singleton ids.

This module holds that inventory as DATA (the behavioral spec the
cascade and the catalog dim are generated from). Routing categories:
review = human page, obvious = bot-fixable, tests = experimental page,
ignored = never rendered. Where an id appears in more than one
reference list, the first list in the reference's own check order
(for_review, obvious_fixes, for_tests, ignored —
`generate_webpage_with_error_output.py:266-275` note_unused_errors)
wins; the tables below are already deduplicated in that order.
"""

from __future__ import annotations

CATEGORY_ORDER = ("review", "obvious", "tests", "ignored")

# -- shape 1: secondary-class article phrases -------------------------------
# category -> phrases ({phrase} in the generated id). The wikidata
# instance-of key for each phrase is the phrase minus its leading
# article (see instance_key / PHRASE_BY_INSTANCE below).
SECONDARY_TARGETS: dict[str, tuple[str, ...]] = {
    'review': (
        'a battle', 'a bicycle sharing system', 'a brand', 'a ceremony',
        'a certification mark', 'a chain store', 'a coat of arms',
        'a conflict', 'a crime', 'a cuisine', 'a death', 'a deity',
        'a disaster', 'a family name', 'a fictional entity', 'a film',
        'a food', 'a gene', 'a given name', 'a heraldic animal',
        'a historical event', 'a history of a geographic region', 'a horse',
        'a human', 'a human language', 'a legal action', 'a letter',
        'a medical specialty', 'a meeting', 'a mental process',
        'a migration', 'a military operation', 'a multinational corporation',
        'a podcast', 'a postal service', 'a profession', 'a protest',
        'a public transport network', 'a recurring sports event',
        'a religious denomination', 'a restaurant chain', 'a road type',
        'a robbery', 'a saying', 'a sermon', 'a shooting', 'a social issue',
        'a software', 'a spirit', 'a sport', 'a sports competition',
        'a stampede', 'a television program', 'a television series',
        'a terrorist organisation', 'a train category',
        'a transport accident', 'a travel', 'a type of sport',
        'a type of structure', 'a type of world view',
        'a vehicle model or class', 'a violation of law',
        'a weapon model or class', 'a website', 'a word or phrase',
        'an animal or plant (and not an individual one)',
        'an aspect in a geographic region', 'an electric utility',
        'an electric vehicle charging network',
        'an electronic device model series', 'an explosion',
        'an overview article',
    ),
    'tests': (
        'a behavior', 'a belief', 'a branch of psychology', 'a burial',
        'a feeding', 'a form of art', 'a general industry',
        'a human activity', 'a human behavior', 'a lost work',
        'a mining (activity - likely mine/quarry etc should be set instead)',
        'a motion', 'a physical process', 'a police operation',
        'a postal and courier activity', 'a science', 'a service',
        'a signage', 'a structural failure', 'a superstitution',
        'a television station', 'a temporary exhibition', 'a volunteer',
        'a wikimedia page', 'an academic discipline', 'an aircraft crash',
        'an education (transmission of knowledge and skills)',
        'an emergency service', 'an event', 'an insurance',
        'an intentional human activity',
        'an object that exists outside physical reality',
        'art (field of work, not the resulting work)',
    ),
    'ignored': (
        'a branch of military service', 'a broadcaster',
        'a church architecture', 'a company that has multiple locations',
        'a construction (as economic activity)', 'a festival',
        'a film festival', 'a genre', 'a geodetic control network',
        'a government program', 'a music festival', 'a radio station',
        'a religious sculpture (genre)', 'a research', 'a research project',
        'a social movement', 'a spheroidal weathering', 'a surface mining',
        'a tradition', 'a transport by country or region', 'an annual event',
        'an art genre', 'an economic sector', 'an evaluation',
        'an uncoordinable generic object',
    ),
}

# -- shape 2: prefixed variant stems ----------------------------------------
# variant stem -> category -> secondary-key prefixes ({prefix} in
# "{stem} - for {prefix} prefixed tags").
PREFIXED_VARIANTS: dict[str, dict[str, tuple[str, ...]]] = {
    'malformed secondary wikidata tag': {
        'review': (
            'architect', 'artist', 'artist_name', 'brand', 'buried', 'flag',
            'genus', 'manufacturer', 'model', 'name', 'name:etymology',
            'network', 'not:brand', 'not:operator', 'old_name:etymology',
            'on_the_list', 'operator', 'owner', 'parish',
            'post_office:service_provider', 'royal_cypher', 'species',
            'subject', 'taxon',
        ),
        'tests': (
            'artwork_subject', 'bridge', 'denomination', 'network:2',
            'sculptor', 'tank:model',
        ),
        'ignored': (
            'alt_name', 'branch', 'cultural_district', 'delivery:partner',
            'destination', 'disused:branch', 'disused:operator',
            'healthcare:speciality', 'jukebox:brand', 'mascot:etymology',
            'object', 'official_name', 'official_name:etymology',
            'old_brand', 'old_operator', 'organ', 'post_office:brand',
            'proposed:brand', 'ref', 'related',
        ),
    },
    'malformed secondary wikipedia tag': {
        'review': (
            'architect', 'artist', 'buried', 'flag', 'genus', 'manufacturer',
            'model', 'name', 'name:etymology', 'network', 'not',
            'old_name:etymology', 'on_the_list', 'operator', 'parish',
            'royal_cypher', 'species', 'subject', 'taxon',
        ),
        'tests': (
            'artwork_subject', 'bridge', 'denomination', 'network:2',
            'sculptor', 'tank:model',
        ),
        'ignored': (
            'abandoned', 'abandoned:brand', 'abandoned:operator', 'alt_name',
            'artist_name', 'branch', 'brand', 'construction:brand',
            'cultural_district', 'disused', 'disused:branch',
            'disused:brand', 'disused:operator', 'healthcare:speciality',
            'mascot:etymology', 'no', 'object', 'official_name:etymology',
            'old_brand', 'old_operator', 'old_wikidata', 'organ',
            'post_office:brand', 'post_office:service_provider',
            'proposed:brand', 'razed', 'razed:brand', 'ref', 'related',
            'removed', 'removed:brand', 'supervisor_district', 'tunnel',
            'vehicle', 'was', 'was:brand',
        ),
    },
    'wikipedia wikidata mismatch': {
        'review': (
            'architect', 'artist', 'buried', 'flag', 'genus', 'manufacturer',
            'model', 'name', 'name:etymology', 'network', 'not',
            'old_name:etymology', 'on_the_list', 'operator', 'parish',
            'royal_cypher', 'siren:model', 'species', 'subject', 'taxon',
        ),
        'tests': (
            'artist_name', 'artwork_subject', 'bridge', 'denomination',
            'network:2', 'owner', 'sculptor', 'tank:model',
        ),
        'ignored': (
            'abandoned', 'abandoned:brand', 'abandoned:operator', 'alt_name',
            'branch', 'brand', 'construction:brand', 'cultural_district',
            'disused', 'disused:branch', 'disused:brand', 'disused:operator',
            'healthcare:speciality', 'mascot:etymology', 'not:brand',
            'object', 'official_name:etymology', 'old_brand', 'old_operator',
            'old_wikidata', 'organ', 'post_office:brand',
            'post_office:service_provider', 'proposed:brand', 'razed',
            'razed:brand', 'ref', 'related', 'removed', 'removed:brand',
            'supervisor_district', 'tunnel', 'vehicle', 'was', 'was:brand',
        ),
    },
    'wikipedia wikidata mismatch - follow wikidata redirect': {
        'review': (
            'not',
        ),
        'obvious': (
            'architect', 'artist', 'brand', 'buried', 'flag', 'genus',
            'manufacturer', 'model', 'name', 'name:etymology', 'network',
            'network:2', 'old_name:etymology', 'on_the_list', 'operator',
            'parish', 'species', 'subject', 'tank:model', 'taxon',
        ),
        'tests': (
            'artist_name', 'artwork_subject', 'bridge', 'denomination',
            'owner', 'sculptor',
        ),
        'ignored': (
            'abandoned', 'abandoned:brand', 'abandoned:operator', 'alt_name',
            'branch', 'construction:brand', 'cultural_district', 'disused',
            'disused:branch', 'disused:brand', 'disused:operator',
            'healthcare:speciality', 'mascot:etymology', 'object',
            'official_name:etymology', 'old_brand', 'old_operator',
            'old_wikidata', 'organ', 'post_office:brand',
            'post_office:service_provider', 'proposed:brand', 'razed',
            'razed:brand', 'ref', 'related', 'removed', 'removed:brand',
            'supervisor_district', 'tunnel', 'vehicle', 'was', 'was:brand',
        ),
    },
    'wikipedia wikidata mismatch - follow wikipedia redirect': {
        'review': (
            'not',
        ),
        'obvious': (
            'architect', 'artist', 'buried', 'flag', 'genus', 'manufacturer',
            'model', 'name', 'name:etymology', 'network', 'network:2',
            'old_name:etymology', 'on_the_list', 'operator', 'parish',
            'species', 'subject', 'tank:model', 'taxon',
        ),
        'tests': (
            'artist_name', 'artwork_subject', 'bridge', 'denomination',
            'owner', 'sculptor',
        ),
        'ignored': (
            'abandoned', 'abandoned:brand', 'abandoned:operator', 'alt_name',
            'branch', 'brand', 'construction:brand', 'cultural_district',
            'disused', 'disused:branch', 'disused:brand', 'disused:operator',
            'healthcare:speciality', 'mascot:etymology', 'object',
            'official_name:etymology', 'old_brand', 'old_operator',
            'old_wikidata', 'organ', 'post_office:brand',
            'post_office:service_provider', 'proposed:brand', 'razed',
            'razed:brand', 'ref', 'related', 'removed', 'removed:brand',
            'supervisor_district', 'tunnel', 'vehicle', 'was', 'was:brand',
        ),
    },
    'wikipedia wikidata mismatch - wikipedia points to disambiguation page and wikidata does not': {
        'review': (
            'architect', 'artist', 'buried', 'flag', 'genus', 'manufacturer',
            'model', 'name', 'name:etymology', 'network', 'not',
            'old_name:etymology', 'on_the_list', 'operator', 'parish',
            'royal_cypher', 'species', 'subject', 'taxon',
        ),
        'tests': (
            'artist_name', 'artwork_subject', 'bridge', 'denomination',
            'network:2', 'owner', 'sculptor', 'tank:model',
        ),
        'ignored': (
            'abandoned', 'abandoned:brand', 'abandoned:operator', 'alt_name',
            'branch', 'brand', 'construction:brand', 'cultural_district',
            'disused', 'disused:branch', 'disused:brand', 'disused:operator',
            'healthcare:speciality', 'mascot:etymology', 'object',
            'official_name:etymology', 'old_brand', 'old_operator',
            'old_wikidata', 'organ', 'post_office:brand',
            # NOT a transcription error: the reference's own list has
            # this malformed entry (generate_webpage_with_error_output
            # .py:1001 — 'post_office:bservice_provider and'), so the
            # well-formed post_office:service_provider disambig id is
            # unrouted there too; note_unused_errors surfaces it in
            # both engines. Kept verbatim for byte-exact id parity.
            'post_office:bservice_provider and', 'proposed:brand', 'razed',
            'razed:brand', 'ref', 'related', 'removed', 'removed:brand',
            'supervisor_district', 'tunnel', 'vehicle', 'was', 'was:brand',
        ),
    },
}

# -- shape 3: singleton ids -------------------------------------------------
# category -> ids (everything in the reference lists that is not one of
# the two generated shapes above).
SINGLETON_IDS: dict[str, tuple[str, ...]] = {
    'review': (
        'wikipedia tag links to 404', 'wikidata tag links to 404',
        'link to a disambiguation page', 'wikipedia wikidata mismatch',
        'tag may be added based on wikidata',
        'tag may be added based on wikidata - teryt',
        'invalid old-style wikipedia tag', 'malformed wikidata tag',
        'malformed wikipedia tag',
        'malformed wikipedia tag - nonexisting language code',
        'information board with wikipedia tag, not subject:wikipedia',
        'information board with wikidata tag, not subject:wikidata',
        'blacklisted connection with known replacement',
        'mismatching teryt:simc codes in wikidata and in osm element',
        'wikipedia tag in outdated form and there is mismatch between links',
        'wikipedia wikidata mismatch - wikipedia points to disambiguation page and wikidata does not',
        'wikipedia/wikidata type tag that is incorrect according to not:* tag',
        'wikipedia tag needs to be removed based on wikidata code and teryt:simc identifier',
        'secondary wikidata tag links to 404',
        'bridge:wikipedia - move to bridge outline',
        'bridge:wikidata - move to bridge outline',
        'bridge:wikipedia and bridge:wikidata - move to bridge outline',
        'wikipedia tag links bot wikipedia, good one in expected language found',
        'wikipedia tag links bot wikipedia',
        'wikipedia tag unexpected language',
        'something is wrong with wikipedia tag - fixme:wikipedia is present',
    ),
    'obvious': (

        'wikipedia tag in unexpected language, good one in expected language found',
        'wikipedia tag from wikipedia tag in an outdated form',
        'wikipedia wikidata mismatch - follow wikipedia redirect',
        'wikipedia from wikidata tag',
        'wikipedia from wikidata tag, unexpected language',
        'wikidata from wikipedia tag',
        'wikipedia tag in an outdated form for removal',
        'wikipedia tag from wikipedia tag in an outdated form and wikidata',
        'wikipedia wikidata mismatch - follow wikidata redirect',
        'wikipedia tag using redirecting language code',
        'wikipedia needs to be updated based on wikidata code and teryt:simc identifier',
    ),
    'tests': (

        'genus secondary tag links something that is not species according to wikidata',
        'species secondary tag links something that is not species according to wikidata',
        'no longer existing brand (according to Wikidata) - and marked as active shop in OSM, with tagging referring to defunct one',
    ),
    'ignored': (

        'no longer existing brand (according to Wikidata) - and marked as active shop in OSM',
        'wikipedia wikidata mismatch, wikipedia links to section - high risk of false positive',
        'malformed secondary wikidata tag for name:etymology:wikidata:missing tag',
        'no longer existing brand (according to Wikidata) - and tag processing has not worked well',
        'no longer existing object (according to Wikidata)',
        'species secondary tag links something that is not species according to wikidata (checking P105)',
        'genus secondary tag links something that is not genus according to wikidata (checking P105)',
        'taxon secondary tag links something that is not taxon according to wikidata (checking regular ontology)',
        'malformed secondary wikipedia tag for wikipedia_list:de tag',
        'should use a secondary wikipedia tag - linking to a geodetic control network',
        'should use a secondary wikipedia tag - linking to a music festival',
        'name:etymology:wikidata:missing', 'link to a list',
    ),
}


def instance_key(phrase: str) -> str:
    """wikidata instance-of class key for a secondary-target phrase:
    the phrase minus its leading English article ("a battle" ->
    "battle"). Legacy datagen aliases keep the original short keys."""
    for art in ("a ", "an "):
        if phrase.startswith(art):
            return phrase[len(art):]
    return phrase


# legacy instance-of keys (pre-breadth datagen vocabulary) -> phrase
LEGACY_INSTANCE_ALIASES: dict[str, str] = {
    "taxon": "an animal or plant (and not an individual one)",
    "event": "a historical event",
}


def phrase_tables() -> tuple[dict[str, str], dict[str, str]]:
    """(instance_of -> phrase, phrase -> category)."""
    by_instance: dict[str, str] = {}
    category: dict[str, str] = {}
    for cat in CATEGORY_ORDER:
        for phrase in SECONDARY_TARGETS.get(cat, ()):
            category.setdefault(phrase, cat)
            by_instance.setdefault(instance_key(phrase), phrase)
    for key, phrase in LEGACY_INSTANCE_ALIASES.items():
        by_instance[key] = phrase
    return by_instance, category
