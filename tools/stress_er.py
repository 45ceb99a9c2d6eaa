#!/usr/bin/env python
"""100x-record ER stress (the PERF.md "Round-8 stress" recipe, persisted).

2M parts = 20k bases x 20 families x 5 members.  The 4-char family tag
sits at the FRONT so each family's PassJoin segment keys are its own;
members differ by a single trailing digit (within-family edit <= 2,
cross-family >= 4).  This is 100x RECORDS with 100x ENTITIES — the
shape that stalled the pre-PassJoin band+salt plan outright (~3.6e10-row
join, killed at 25 min; PERF.md "Round-8 stress").

    python tools/stress_er.py [--fuzzy-only]

Run on a QUIET machine (check `uptime` first) — the r8 numbers carried
~25-30 cores of ambient load and are upper bounds.  The golden-record
leg needs the durable checkpoint knob (components over ~177M directed
edges OOM the driver JVM under localCheckpoint), set below.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from merl_etl_spark import registry  # noqa: E402
from merl_etl_spark.session import get_spark  # noqa: E402
import merl_etl_spark.operators.linkage as linkage  # noqa: E402
from merl_etl_spark.sources.tables import load_table as orig_load  # noqa: E402

SF = "/root/testdata/sf0.1"


def part_100x(spark, sf_dir):
    part = orig_load(spark, sf_dir, "part")
    rep = F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep")
    fam = (F.col("rep") / 5).cast("int")
    mem = F.col("rep") % 5
    tag = F.concat_ws(
        "", *[F.chr((F.lit(97) + F.pmod(fam, F.lit(20))).cast("long"))] * 4
    )
    name = F.concat(
        tag, F.lit(" "), F.col("p_name"),
        F.when(mem > 0, mem.cast("string")).otherwise(F.lit("")),
    )
    return part.select("*", rep).select(
        (F.col("p_partkey") + F.col("rep") * 10_000_000).alias("p_partkey"),
        name.alias("p_name"),
        "p_brand", "p_type", "p_size", "p_retailprice",
    )


def timed(label, df):
    t0 = time.perf_counter()
    n = df.count()
    print(f"{label}: rows={n} cold={time.perf_counter() - t0:.1f}s", flush=True)
    return n


def main() -> int:
    registry.load_all()
    spark = get_spark("stress_er")

    def patched(spark_, sf_dir, name):
        if name == "part":
            return part_100x(spark_, sf_dir)
        return orig_load(spark_, sf_dir, name)

    linkage.load_table = patched
    try:
        # fuzzy leg: default executor-local cuts (the r8 measurement mode)
        timed("link-fuzzy-match 100x (2M parts, 100x entities)",
              registry.QUERIES["link-fuzzy-match"](spark, SF))
        if "--fuzzy-only" not in sys.argv:
            # golden-record leg: durable lineage cuts — components over
            # ~177M directed edges OOM the driver JVM under the default
            # localCheckpoint (PERF.md r8).  Reliable mode REQUIRES a
            # checkpoint directory; without one every cut_lineage call
            # dies with "checkpoint directory has not been set".
            spark.conf.set("spark.merl.checkpoint.reliable", "true")
            spark.sparkContext.setCheckpointDir("/tmp/merl_ckpt_stress")
            timed("link-golden-record 100x (2M parts)",
                  registry.QUERIES["link-golden-record"](spark, SF))
    finally:
        linkage.load_table = orig_load
        spark.conf.set("spark.merl.checkpoint.reliable", "false")
        # the reliable checkpoints of components over ~177M directed
        # edges are multi-GB — drop them, or repeated runs fill /tmp
        import shutil

        shutil.rmtree("/tmp/merl_ckpt_stress", ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
