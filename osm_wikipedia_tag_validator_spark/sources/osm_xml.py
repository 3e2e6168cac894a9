"""OSM XML source — S3 of SURVEY.md §2.1.

The reference iterates node/way/relation records from an .osm XML file
without loading it whole (`xml_streaming_of_osm_file`,
`load_osm_file.py:45-83`): node lat/lon from attributes, way/relation
from the <center> child, tags from <tag k v> children.

Spark realization: one task per file (files are the reference's unit
of download — one .osm per region), incremental `iterparse` inside
mapInPandas so memory stays O(element), never O(file). A binary `.osm`
ingest directory becomes the `elements` DataFrame in one pass.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ELEMENTS_XML_SCHEMA = (
    "type string, id long, lat double, lon double, tags map<string,string>, "
    "area_identifier string"
)


def parse_osm_xml(data: bytes, area_identifier: str) -> Iterator[dict]:
    """Incremental parse of one .osm payload → element dicts.

    Mirrors `load_osm_file.py:45-83`: elements without a location are
    skipped; way/relation center provides lat/lon; empty-tag elements
    are kept here (the P2 filter is a relational stage, not the scan's
    job — unlike the reference, which fused filtering into parsing).
    """
    import io

    for _event, elem in ET.iterparse(io.BytesIO(data), events=("end",)):
        kind = elem.tag
        if kind not in ("node", "way", "relation"):
            continue
        lat = elem.get("lat")
        lon = elem.get("lon")
        if lat is None or lon is None:
            center = elem.find("center")
            if center is not None:
                lat = center.get("lat")
                lon = center.get("lon")
        if lat is None or lon is None:
            elem.clear()
            continue
        tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
        yield {
            "type": kind,
            "id": int(elem.get("id")),
            "lat": float(lat),
            "lon": float(lon),
            "tags": tags,
            "area_identifier": area_identifier,
        }
        elem.clear()  # O(element) memory


def read_osm_xml(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of .osm files → elements DataFrame.

    `binaryFile` gives (path, content) rows; one parse task per file —
    the same parallel grain as the reference's per-region downloads.
    area_identifier = file stem, like the reference naming its files
    after the region (`obtain_from_overpass.py:28-33`).
    """

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                stem = r.path.rsplit("/", 1)[-1].removesuffix(".osm")
                rows.extend(parse_osm_xml(bytes(r.content), stem))
            yield pd.DataFrame(
                rows,
                columns=["type", "id", "lat", "lon", "tags", "area_identifier"],
            )

    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.osm").load(path)
    return files.select("path", "content").mapInPandas(parse, ELEMENTS_XML_SCHEMA)
