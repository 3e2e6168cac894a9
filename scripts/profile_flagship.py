#!/usr/bin/env python
"""Stage-by-stage timing of the flagship pipeline — used to bisect
wall-time between datagen, validator, and the image⋈element join.
Run from the repo root: python scripts/profile_flagship.py [n_elem n_img]
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())


def main() -> None:
    n_elem = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_img = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000

    from osm_wikipedia_tag_validator_spark.datagen import world as W
    from osm_wikipedia_tag_validator_spark.plans import pipeline as P
    from osm_wikipedia_tag_validator_spark.session import get_spark

    spark = get_spark(cores=32, shuffle_partitions=32)
    # warm workers
    spark.range(32, numPartitions=32).mapInPandas(lambda it: it, "id long").count()

    def t(label, fn):
        t0 = time.time()
        n = fn()
        print(f"{label:28s} {time.time() - t0:7.2f}s  ({n} rows)")

    inputs = {
        "elements": W.spark_elements(spark, n_elem),
        "images": W.spark_images(spark, n_img),
        "polygons": W.spark_polygons(spark),
        "regions": W.spark_regions(spark),
        "wiki": W.spark_wiki_entities(spark),
        "error_catalog": W.spark_error_catalog(spark),
    }
    t("elements datagen only", lambda: inputs["elements"].count())
    t("images datagen only", lambda: inputs["images"].count())

    validated = P.validated_elements(inputs)
    t("validated (full cascade)", lambda: validated.count())
    v2 = validated.cache()
    t("validated (cache fill)", lambda: v2.count())
    t("error_reports", lambda: P.error_reports(v2, inputs["regions"]).count())
    t("region_rollup", lambda: P.region_rollup(
        v2, inputs["regions"], inputs["error_catalog"]).count())
    t("image_tile_assignments", lambda: P.image_tile_assignments(
        inputs["images"], v2, inputs["polygons"]).count())
    v2.unpersist()


if __name__ == "__main__":
    main()
