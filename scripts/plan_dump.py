import sys; import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.sql.adaptive.enabled","true")
         .config("spark.ui.enabled","false").getOrCreate())
sf = "/root/testdata/sf0.01"
from nmalign_spark.functions.normalize import DEFAULT_NORMALIZATION
from nmalign_spark.operators.align import align_pages
from nmalign_spark.operators import relational, dedup, similarity
from nmalign_spark.sources.pages import pages_from_documents

def dump(name, df):
    print(f"\n##### PLAN {name} #####")
    print(df._sc is not None and df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

dump("align_pages", align_pages(pages_from_documents(spark, sf), normalization=DEFAULT_NORMALIZATION))
dump("j1_page_pairing", relational.j1_page_pairing(spark, sf))
dump("f4_lev_similarity", relational.f4_lev_similarity(spark, sf))
dump("dedup_minhash_lsh", dedup.minhash_lsh_pairs(spark, sf))
dump("sim_topk_cosine", similarity.brute_force_topk(spark, sf))
spark.stop()
