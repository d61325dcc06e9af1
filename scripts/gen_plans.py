import sys, io, contextlib
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.ui.enabled","false").getOrCreate())
from vexor_spark import catalog
from vexor_spark.index.storage import PersistedIndex

def plan_of(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

out = []
sf = "/root/testdata/sf0.01"

df = catalog.q_bm25_top10(spark, sf)
out.append(("bm25_top10 over documents (scan -> broadcast term join -> two-phase agg -> TakeOrdered)", plan_of(df)))

pidx = PersistedIndex(spark, "/tmp/idx200k")
out.append(("persisted-index matched-blocks scan (term_bucket partition pruning + term pushdown)",
            plan_of(pidx._matched_blocks(["spark", "merge"]))))
out.append(("distributed BM25 over persisted index (decode UDF -> explode -> hash agg -> TakeOrdered)",
            plan_of(pidx.search_distributed("spark merge index", k=10))))

docs = catalog.docs_table(spark, sf).select("doc_id", "text")
from pyspark.sql import functions as F
pruned = docs.select("doc_id").filter(F.col("doc_id") < 10)
out.append(("column pruning + filter pushdown on parquet scan", plan_of(pruned)))

with open("/root/repo/PLANS.md", "w") as fh:
    fh.write("""# PLANS — physical-plan audit (`.explain(\"formatted\")`)

Evidence that the engine's plans are the plans we want (SURVEY §4):
partition pruning reaches the scan, filters/projections are pushed
down, the query-term join broadcasts, aggregations are two-phase, and
top-k compiles to TakeOrderedAndProject. Captured at sf0.01 /
a 334k-doc persisted index; regenerate with scripts/gen_plans.py.

""")
    for title, plan in out:
        fh.write(f"## {title}\n\n```\n{plan.strip()}\n```\n\n")
print("written")
spark.stop()
