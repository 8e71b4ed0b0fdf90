import sys, time, random; import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_spark, _warm_python_workers
from nmalign_spark.operators.align import align_pages
from nmalign_spark.operators.salt import align_pages_salted
import html as _html

def synth_giant(doc_id, n_lines):
    rng = random.Random(doc_id)
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    lines = [" ".join(rng.choice(words) for _ in range(8)) + f" L{i}" for i in range(n_lines)]
    body = "".join(f"<p>{_html.escape(s)}</p>" for s in lines)
    html = f"<html><body>{body}</body></html>".encode()
    return (f"https://g/{doc_id}", html, "\n".join(lines))

def synth_small(doc_id):
    return synth_giant(10000 + doc_id, 12)

spark = make_spark(8)
spark.range(10).count(); _warm_python_workers(spark, 8)
import os
GIANT_LINES = int(os.environ.get('SKEW_GIANT_LINES', '900'))
rows = [synth_small(i) for i in range(3000)] + [synth_giant(i, GIANT_LINES) for i in range(3)]
pages = spark.createDataFrame(rows, "url string, html binary, text string").repartition(64).cache()
pages.count()
for name, fn in [("unsalted", lambda: align_pages(pages, try_subseg=False)),
                 ("salted", lambda: align_pages_salted(pages, try_subseg=False,
                                                       giant_chars=20000, chunk_rows=128))]:
    for trial in range(2):
        t0=time.time(); n = fn().count()
        print(f"{name} trial{trial}: {time.time()-t0:.1f}s rows={n}", flush=True)
spark.stop()
