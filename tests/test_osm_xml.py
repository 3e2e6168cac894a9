import pyspark.sql.functions as F

from osm_wikipedia_tag_validator_spark.operators.validator import relevance_filter
from osm_wikipedia_tag_validator_spark.sources.osm_xml import read_osm_xml

XML_A = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6">
  <node id="101" lat="1.5" lon="2.5">
    <tag k="wikipedia" v="en:Thing"/>
    <tag k="name" v="A thing"/>
  </node>
  <node id="102" lat="3.0" lon="4.0"/>
  <way id="201">
    <center lat="5.5" lon="6.5"/>
    <nd ref="101"/>
    <tag k="brand:wikidata" v="Q42"/>
  </way>
  <relation id="301">
    <tag k="wikidata" v="Q7"/>
  </relation>
</osm>
"""

XML_B = """<osm version="0.6">
  <node id="103" lat="-1.0" lon="-2.0"><tag k="amenity" v="bench"/></node>
</osm>
"""


def test_read_osm_xml(spark, tmp_path):
    (tmp_path / "alpha.osm").write_text(XML_A)
    (tmp_path / "beta.osm").write_text(XML_B)
    df = read_osm_xml(spark, str(tmp_path)).cache()
    pdf = df.toPandas().set_index("id")
    # relation without location is skipped (load_osm_file.py:79-83 keeps
    # relations only via center; ours has none)
    assert sorted(pdf.index) == [101, 102, 103, 201]
    assert pdf.loc[101, "tags"] == {"wikipedia": "en:Thing", "name": "A thing"}
    assert pdf.loc[201, "lat"] == 5.5 and pdf.loc[201, "lon"] == 6.5
    assert pdf.loc[201, "type"] == "way"
    assert pdf.loc[102, "tags"] == {}
    assert pdf.loc[101, "area_identifier"] == "alpha"
    assert pdf.loc[103, "area_identifier"] == "beta"
    # relevance filter composes on top of the scan (P1/P2)
    rel = df.filter(relevance_filter(df)).toPandas()
    assert sorted(rel["id"]) == [101, 201]
