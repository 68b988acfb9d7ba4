"""DataFrame→DataFrame operators (SURVEY.md §2).

Modules:

- ``topk``       — T1-T4/T6/T7 sort/limit/top-k family
- ``crawl_ops``  — P6 crawl filter + backfill, A5 topic grouping, T4 ranking
- ``citations``  — P8 scrub UDF, P12 renumbering, J3 index join, A7 cite_ratio
- ``chunker``    — C1-C3 token-budget chunking / bin-packing
- ``llm_op``     — the generic batched-LLM ``mapInPandas`` operator
- ``dedup``      — exact / MinHash-LSH / SimHash / n-gram Jaccard dedup
- ``similarity`` — embedding cosine top-k + LSH-bucketed ANN
- ``text_stats`` — language id, quality scores, fingerprints
- ``skeleton``   — markdown ⇄ tree parse/serialize, J1 alignment
- ``digest_ops`` — A3 digest merge, digest build
- ``eval_ops``   — A8 averaging, A9 claim metrics, token-F1 scorers
"""
