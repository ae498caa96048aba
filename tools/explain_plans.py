"""Physical-plan evidence: writes PLANS.md with `.explain` output for
the load-bearing queries plus automated checks that the plans have the
shape a 100 TB run needs:

- scans show PushedFilters / pruned ReadSchema (no full-width reads)
- enrich joins are BroadcastHashJoin (never SortMergeJoin on a dim)
- the pipeline has no shuffle before the aggregate's own exchange
- WholeStageCodegen spans cover the parse expressions

Usage: python tools/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry

    from fluent_bit_spark.datagen import generate_pages
    from fluent_bit_spark.pipeline import build_pipeline
    from fluent_bit_spark.session import get_spark

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    sections: list[tuple[str, str, list[str]]] = []
    checks: list[tuple[str, bool, str]] = []

    # 1. scan pruning: a projection query must not read all columns
    docs_proj = qs["token_count"](spark, sf_dir)
    p = plan_of(docs_proj)
    read = re.search(r"ReadSchema: struct<([^>]*)>", p)
    ok = read is not None and "n_chars" not in read.group(1)
    checks.append(("column pruning reaches the parquet scan (token_count)", ok,
                   read.group(1) if read else "no ReadSchema found"))
    sections.append(("token_count (column pruning)", p, []))

    # 2. filter pushdown (numeric predicates reach the parquet scan;
    #    regex filters are correctly NOT pushed — parquet can't)
    p = plan_of(qs["sp_select_where"](spark, sf_dir))
    m = re.search(r"PushedFilters: \[([^\]]*)\]", p)
    ok = m is not None and "GreaterThanOrEqual" in m.group(1)
    checks.append(("filter pushdown reaches scan (sp_select_where)", ok,
                   m.group(1)[:80] if m else "no PushedFilters"))
    sections.append(("sp_select_where (predicate pushdown)", p, []))

    # 3. broadcast enrich
    p = plan_of(qs["enrich_broadcast"](spark, sf_dir))
    ok = "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    checks.append(("enrich joins broadcast, never sort-merge", ok, ""))
    sections.append(("enrich_broadcast", p, []))

    # 4. pipeline shuffle count: routed path must be shuffle-free;
    #    aggregates exactly one exchange
    def n_exchanges(plan: str) -> int:
        # formatted mode prints each node twice (tree + details);
        # count unique tree nodes "Exchange (N)"
        return len(set(re.findall(r"Exchange \((\d+)\)", plan)))

    res = build_pipeline(generate_pages(spark, 1000), from_html=True)
    p_routed = plan_of(res.routed.drop("html"))
    n_ex = n_exchanges(p_routed)
    checks.append(("routed fan-out is shuffle-free (0 Exchange)", n_ex == 0, f"{n_ex} exchanges"))
    ok = "Python" not in p_routed and "ArrowEval" not in p_routed
    checks.append(("html extraction stage fully JVM (no Python in routed plan)", ok, ""))
    p_aggs = plan_of(res.aggregates)
    n_ex = n_exchanges(p_aggs)
    checks.append(("aggregate path: single hash exchange", n_ex == 1, f"{n_ex} exchanges"))
    sections.append(("pipeline routed (shuffle-free)", p_routed, []))
    sections.append(("pipeline aggregates (one exchange)", p_aggs, []))

    # 5. codegen coverage on the parse stage (formatted mode tags
    #    codegen'd operators with "[codegen id : N]")
    ok = "codegen id" in p_routed
    checks.append(("parse stage inside WholeStageCodegen", ok, ""))

    # 6. multiline_java: the per-line regex bitmask runs JVM-side; the
    #    only Python in the plan is the grouped DFA (FlatMapGroupsInPandas)
    p = plan_of(qs["multiline_java"](spark, sf_dir))
    ok = (
        "FlatMapGroupsInPandas" in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
    )
    checks.append(
        ("multiline DFA: regex bitmask JVM-side, Python only in grouped walk",
         ok, "")
    )
    n_ex = n_exchanges(p)
    checks.append(
        ("multiline DFA: single exchange (stream-key groupBy)",
         n_ex == 1, f"{n_ex} exchanges")
    )
    sections.append(("multiline_java (JVM bitmask + grouped DFA)", p, []))

    # 7. minhash triage: signature table persisted and reused (both
    #    triage branches + verify read the cache, not re-shingled text)
    p = plan_of(qs["dedup_minhash_lsh"](spark, sf_dir))
    ok = "InMemoryTableScan" in p or "TableCacheQueryStage" in p
    checks.append(
        ("minhash LSH: persisted signature table reused across branches",
         ok, "")
    )
    sections.append(("dedup_minhash_lsh (triage over cached sigs)", p, []))

    # 8. multimodal_decode: container bytes assembled in codegen, one
    #    Arrow-batched MapInPandas for the header parse
    p = plan_of(qs["multimodal_decode"](spark, sf_dir))
    ok = "MapInPandas" in p and "codegen id" in p
    checks.append(
        ("multimodal decode: codegen byte assembly + single MapInPandas",
         ok, "")
    )

    # 9. ann_ivf_topk: Arrow-vectorized cell assignment (no interpreted
    #    per-centroid expression tree), candidate fan-in via broadcast
    #    hash equi-join on cell — never a nested-loop cross join
    p = plan_of(qs["ann_ivf_topk"](spark, sf_dir))
    ok = (
        "ArrowEvalPython" in p
        and "BroadcastHashJoin" in p
        and "BroadcastNestedLoopJoin" not in p
    )
    checks.append(
        ("IVF: Arrow cell assignment + broadcast equi-join, no cross join",
         ok, "")
    )
    sections.append(("ann_ivf_topk (Arrow assignment, cell equi-join)", p, []))

    # 10. geoip2: single Arrow-batched lookup pass over the broadcast
    #     mmdb (one ArrowEvalPython per lookup key)
    p = plan_of(qs["geoip2"](spark, sf_dir))
    # formatted explain names each node twice (tree + detail): one
    # Arrow stage == exactly one "(n) ArrowEvalPython" detail header
    ok = len(re.findall(r"^\(\d+\) ArrowEvalPython", p, re.M)) == 1
    checks.append(("geoip2: ONE Arrow lookup pass per lookup key", ok, ""))

    # 11. html_extract: the whole extract chain is a codegen projection
    p = plan_of(qs["html_extract"](spark, sf_dir))
    ok = (
        n_exchanges(p) == 0
        and "Python" not in p
        and "codegen id" in p
    )
    checks.append(("html_extract: zero-exchange codegen projection", ok, ""))
    sections.append(("html_extract (JVM extraction chain)", p, []))

    # 11b. corpus_prep: the full extract->dedup->gate->lang-ID->card
    #      composite stays JVM-side end to end; shuffles are exactly
    #      the dedup groupBy, the survivor join, and the final card
    #      aggregate (AQE may collapse/broadcast some at runtime)
    p = plan_of(qs["corpus_prep"](spark, sf_dir))
    n_ex = n_exchanges(p)
    ok = "Python" not in p and n_ex <= 4 and "BroadcastHashJoin" in p
    checks.append(
        ("corpus_prep: all-JVM composite, broadcast survivor join, "
         "bounded shuffles (dedup+card aggs)",
         ok, f"{n_ex} exchanges")
    )
    sections.append(("corpus_prep (composite corpus card)", p, []))

    # 12. metrics_labels: label-map rewrite adds no exchange beyond
    #     the metric aggregation's own
    p = plan_of(qs["metrics_labels"](spark, sf_dir))
    n_ex = n_exchanges(p)
    ok = n_ex == 1 and "Python" not in p
    checks.append(
        ("processor_labels: map rewrite is projection-only (1 agg exchange)",
         ok, f"{n_ex} exchanges")
    )

    # 13. web-corpus filters: the per-row signal ops are zero-exchange
    #     codegen projections (map-only at 100 TB)
    for qname in ("gopher_quality", "line_repetition", "pii_scrub",
                  "c4_line_filter"):
        p = plan_of(qs[qname](spark, sf_dir))
        n_ex = n_exchanges(p)
        ok = n_ex == 0 and "Python" not in p and "codegen id" in p
        checks.append(
            (f"{qname}: zero-exchange all-JVM projection", ok,
             f"{n_ex} exchanges")
        )
    sections.append(
        ("gopher_quality (map-only web filter)",
         plan_of(qs["gopher_quality"](spark, sf_dir)), [])
    )

    # 14. top_bigram: explode -> two map-side-combinable aggregates,
    #     no window, no Python
    p = plan_of(qs["top_bigram"](spark, sf_dir))
    n_ex = n_exchanges(p)
    ok = n_ex == 2 and "Window" not in p and "Python" not in p
    checks.append(
        ("top_bigram: explode + 2 partial-agg exchanges, no window",
         ok, f"{n_ex} exchanges")
    )
    sections.append(("top_bigram (distributed argmax)", p, []))

    # 14b. decontam: benchmark hash set is BROADCAST — the corpus side
    #      never shuffles until the per-doc count of matches
    p = plan_of(qs["decontam"](spark, sf_dir))
    ok = (
        "BroadcastHashJoin" in p
        and "SortMergeJoin" not in p
        and "Python" not in p
    )
    checks.append(
        ("decontam: broadcast benchmark n-gram join, no sort-merge", ok, "")
    )
    sections.append(("decontam (broadcast benchmark overlap)", p, []))

    # 14c. sessionize: one exchange on the session key, no Python
    p = plan_of(qs["sessionize"](spark, sf_dir))
    n_ex = n_exchanges(p)
    ok = n_ex == 1 and "Python" not in p
    checks.append(
        ("sessionize: one exchange (session-key aggregate)", ok,
         f"{n_ex} exchanges")
    )

    # 14d. lm_score: vocab joined back BROADCAST (Zipf-small dim), all
    #      JVM — the two corpus passes are plain partial-agg shuffles
    p = plan_of(qs["lm_score"](spark, sf_dir))
    ok = "BroadcastHashJoin" in p and "Python" not in p
    checks.append(("lm_score: broadcast vocab join, all-JVM two-pass", ok, ""))
    sections.append(("lm_score (unigram LM scoring)", p, []))

    # 14e. url_filter: blocklist broadcast; URL parse pure JVM (AQE's
    #      pre-execution formatted plan omits codegen ids, so the gate
    #      is no-Python + broadcast, never sort-merge)
    p = plan_of(qs["url_filter"](spark, sf_dir))
    ok = (
        "BroadcastHashJoin" in p
        and "SortMergeJoin" not in p
        and "Python" not in p
    )
    checks.append(("url_filter: all-JVM URL parse + broadcast blocklist", ok, ""))

    # 14f. substring_dedup: duplicated n-gram set joined back BROADCAST
    #      (Zipf tail), span merge pure Catalyst arrays — no Python
    p = plan_of(qs["substring_dedup"](spark, sf_dir))
    ok = "BroadcastHashJoin" in p and "Python" not in p
    checks.append(
        ("substring_dedup: broadcast dup-gram join, Catalyst span merge", ok, "")
    )
    sections.append(("substring_dedup (duplicated-span removal)", p, []))

    # 14g. dedup_clusters: the returned plan reads the CONVERGED label
    #      checkpoint (flat ExistingRDD scan — the propagation loop is
    #      never re-run per action, and plans don't grow per round)
    p = plan_of(qs["dedup_clusters"](spark, sf_dir))
    ok = "ExistingRDD" in p
    checks.append(
        ("dedup_clusters: converged labels from flat checkpoint scan", ok, "")
    )
    from fluent_bit_spark.cache import release_all

    release_all()

    # 14h. incremental_dedup: signature tables persisted and reused by
    #      the band probe + estimate join
    p = plan_of(qs["incremental_dedup"](spark, sf_dir))
    ok = "InMemoryTableScan" in p or "TableCacheQueryStage" in p
    checks.append(
        ("incremental_dedup: persisted sig tables reused across probes", ok, "")
    )
    release_all()

    # 14i. ann_quantized: integer pair math over the broadcast query
    #      side — no Python anywhere, no sort-merge join
    p = plan_of(qs["ann_quantized"](spark, sf_dir))
    ok = "Python" not in p and "SortMergeJoin" not in p
    checks.append(("ann_quantized: all-JVM integer scoring, broadcast side", ok, ""))

    # 14j. curation_pipeline: the chained gates stay JVM-side; the
    #      blocklist and dup-gram joins broadcast
    p = plan_of(qs["curation_pipeline"](spark, sf_dir))
    ok = "Python" not in p and "BroadcastHashJoin" in p
    checks.append(
        ("curation_pipeline: all-JVM chained gates, broadcast dims", ok, "")
    )
    sections.append(("curation_pipeline (capstone composite)", p, []))

    # 14k. sequence_pack: one exchange (the key window), no Python
    p = plan_of(qs["sequence_pack"](spark, sf_dir))
    n_ex = n_exchanges(p)
    ok = n_ex == 1 and "Python" not in p and "Window" in p
    checks.append(
        ("sequence_pack: one exchange (key-window cumsum)", ok, f"{n_ex} exchanges")
    )

    # 14l. corpus_split: split assignment is a projection; the card is
    #      the only aggregation (distinct-count may add its expand)
    p = plan_of(qs["corpus_split"](spark, sf_dir))
    ok = "Python" not in p and n_exchanges(p) <= 2
    checks.append(
        ("corpus_split: projection + card aggregate only", ok,
         f"{n_exchanges(p)} exchanges")
    )

    # 15. domain_cap: single exchange on the domain key
    p = plan_of(qs["domain_cap"](spark, sf_dir))
    n_ex = n_exchanges(p)
    ok = n_ex == 1 and "Python" not in p
    checks.append(
        ("domain_cap: one exchange (domain-key window)", ok,
         f"{n_ex} exchanges")
    )

    # 16. decontam_bloom: the bitset probe is codegen (no interpreted
    #     higher-order lambda in the filter), confirm join broadcasts
    p = plan_of(qs["decontam_bloom"](spark, sf_dir))
    ok = (
        "Python" not in p
        and "BroadcastHashJoin" in p
        and "aggregate(" not in p.lower().split("readschema")[0].split("filter")[0]
    )
    checks.append(
        ("decontam_bloom: codegen bit probes + broadcast confirm join", ok, "")
    )
    sections.append(("decontam_bloom (Bloom prefilter + exact confirm)", p, []))

    # 17. bpe_word_counts: one exchange (partial-agg word count); the
    #     top-k cap is a TakeOrdered, not a full sort
    p = plan_of(qs["bpe_word_counts"](spark, sf_dir))
    n_ex = n_exchanges(p)
    ok = n_ex <= 1 and "TakeOrderedAndProject" in p and "Python" not in p
    checks.append(
        ("bpe_word_counts: one partial-agg exchange + TakeOrdered cap", ok,
         f"{n_ex} exchanges")
    )

    # 18. length_quantiles: one exchange (partial-aggregated percentile
    #     map), scan pruned to (lang, text)
    p = plan_of(qs["length_quantiles"](spark, sf_dir))
    n_ex = n_exchanges(p)
    read = re.search(r"ReadSchema: struct<([^>]*)>", p)
    ok = n_ex == 1 and read is not None and "doc_id" not in read.group(1)
    checks.append(
        ("length_quantiles: one agg exchange, pruned scan", ok,
         f"{n_ex} exchanges; read={read.group(1)[:40] if read else '?'}")
    )

    # 19. corpus_shuffle: one exchange (shard key) + per-shard sort,
    #     scan pruned to the id column
    p = plan_of(qs["corpus_shuffle"](spark, sf_dir))
    n_ex = n_exchanges(p)
    read = re.search(r"ReadSchema: struct<([^>]*)>", p)
    ok = (
        n_ex == 1
        and "Window" in p
        and read is not None
        and "text" not in read.group(1)
    )
    checks.append(
        ("corpus_shuffle: one shard exchange + sort, id-only scan", ok,
         f"{n_ex} exchanges; read={read.group(1)[:30] if read else '?'}")
    )

    # 20. multimodal_resize: exactly one Arrow stage (encode UDF +
    #     decode/resize mapInPandas), zero exchanges
    p = plan_of(qs["multimodal_resize"](spark, sf_dir))
    ok = n_exchanges(p) == 0 and p.count("MapInPandas") <= 2
    checks.append(
        ("multimodal_resize: shuffle-free Arrow decode+resample", ok,
         f"{n_exchanges(p)} exchanges")
    )

    # 21. doc_chunks: zero-exchange map-only generate+slice
    p = plan_of(qs["doc_chunks"](spark, sf_dir))
    ok = n_exchanges(p) == 0 and "Python" not in p and "Generate" in p
    checks.append(
        ("doc_chunks: zero-exchange map-only chunking", ok,
         f"{n_exchanges(p)} exchanges")
    )

    # 22. rag_chunk_topk: chunking stays codegen (Generate), the
    #     embedding is one Arrow stage, and scoring is a single
    #     MapInPandas pass over the data side (the query matrix rides
    #     along as a broadcast VARIABLE, not a join) — no cartesian /
    #     nested-loop join node anywhere
    p = plan_of(qs["rag_chunk_topk"](spark, sf_dir))
    ok = (
        "ArrowEvalPython" in p
        and "MapInPandas" in p
        and "Generate" in p
        and "CartesianProduct" not in p
        and "BroadcastNestedLoop" not in p
    )
    checks.append(
        ("rag_chunk_topk: codegen chunking + Arrow embed + MapInPandas "
         "top-k scoring (no cartesian)", ok, "")
    )

    # 23. text_normalize: zero-exchange codegen projection
    p = plan_of(qs["text_normalize"](spark, sf_dir))
    ok = n_exchanges(p) == 0 and "Python" not in p and "codegen id" in p
    checks.append(
        ("text_normalize: zero-exchange codegen projection", ok,
         f"{n_exchanges(p)} exchanges")
    )

    # 24. grok_parse: whole-stage-codegen projection (the grok macro
    #     expansion is compile-time; execution is plain regexp_extract)
    p = plan_of(qs["grok_parse"](spark, sf_dir))
    ok = n_exchanges(p) == 0 and "Python" not in p and "codegen id" in p
    checks.append(
        ("grok_parse: zero-exchange codegen regex projection", ok,
         f"{n_exchanges(p)} exchanges")
    )

    # 25. lua_script / wasm_filter: interpreter runs in exactly ONE
    #     Arrow MapInPandas stage, zero exchanges — the slow path is a
    #     single map-only pass, never a shuffle participant
    for qname in ("lua_script", "wasm_filter"):
        p = plan_of(qs[qname](spark, sf_dir))
        # formatted plans print each node twice (tree + numbered detail)
        n_arrow = len(re.findall(r"\(\d+\) MapInPandas", p))
        # exactly ONE exchange: the deliberate round-robin rebalance
        # that spreads the CPU-bound interpreter over all cores when
        # the scan has fewer partitions than the cluster (no-op at
        # real scale); and exactly one Arrow stage
        ok = n_exchanges(p) <= 1 and n_arrow == 1
        checks.append(
            (f"{qname}: single MapInPandas stage, <=1 rebalance exchange",
             ok, f"{n_exchanges(p)} exchanges, {n_arrow} arrow stages")
        )
    sections.append((f"wasm_filter (single Arrow interpreter stage)", p, []))

    # 26. kubernetes enrichment: metadata joined BROADCAST; tag regex
    #     extraction stays codegen (no Python)
    from fluent_bit_spark.k8s import kubernetes_filter

    ktag = ("kube.var.log.containers.pod-1_ns_web-" + "a" * 64 + ".log",)
    kdf = spark.createDataFrame([(ktag[0], "m")], "tag string, log string")
    kmeta = spark.createDataFrame(
        [("ns", "pod-1", "uid", {"a": "b"}, None, "n1", "10.0.0.1")],
        "namespace_name string, pod_name string, pod_id string, "
        "labels map<string,string>, annotations map<string,string>, "
        "host string, pod_ip string",
    )
    p = plan_of(kubernetes_filter(kdf, metadata=kmeta))
    # ("Python" appears in local createDataFrame RDD scan args —
    # gate on UDF/Arrow markers instead)
    ok = (
        "BroadcastHashJoin" in p
        and "SortMergeJoin" not in p
        and "EvalPython" not in p
        and "MapInPandas" not in p
    )
    checks.append(
        ("kubernetes: broadcast metadata join, codegen tag regex", ok, "")
    )
    sections.append(("kubernetes_filter (broadcast pod metadata)", p, []))

    # 27. round-4 two-phase exact baselines: the quadratic interpreted
    #     join is GONE — candidate screens run in one Arrow stage
    #     (MapInPandas / grouped pandas), the value-defining round()
    #     stays in Catalyst, and no cartesian/nested-loop join exists
    p = plan_of(qs["dedup_embedding_exact"](spark, sf_dir))
    ok = (
        "MapInPandas" in p
        and "BroadcastNestedLoop" not in p
        and "CartesianProduct" not in p
    )
    checks.append(
        ("dedup_embedding_exact: Arrow matmul screen + Catalyst verify, "
         "no nested-loop join", ok, "")
    )
    sections.append(("dedup_embedding_exact (two-phase screen)", p, []))

    p = plan_of(qs["dedup_ngram_jaccard"](spark, sf_dir))
    ok = (
        "FlatMapGroupsInPandas" in p
        and "BroadcastNestedLoop" not in p
        and "CartesianProduct" not in p
        and "SortMergeJoin" not in p
    )
    checks.append(
        ("dedup_ngram_jaccard: per-block exact-intersection matmul, "
         "no pair self-join", ok, "")
    )

    p = plan_of(qs["dedup_embedding_lsh"](spark, sf_dir))
    ok = "MapInPandas" in p and "CartesianProduct" not in p
    checks.append(
        ("dedup_embedding_lsh: Arrow sequential-fold verify stage", ok, "")
    )

    # 28. round-4 partial_message concat: all-Catalyst — the group agg
    #     shuffles once on (tag, partial_id), the epoch window adds no
    #     Python stage, and ordered concat stays in objectagg/codegen
    p = plan_of(qs["multiline_partial"](spark, sf_dir))
    n_exchanges = p.count("Exchange hashpartitioning")
    ok = (
        "MapInPandas" not in p
        and "FlatMapGroupsInPandas" not in p
        and "BatchEvalPython" not in p
        and n_exchanges <= 3  # window + partial/final agg pair
    )
    checks.append(
        ("multiline_partial: all-Catalyst concat, no Python stage, "
         f"{n_exchanges} hash exchanges", ok, "")
    )
    sections.append(("multiline_partial (partial_message concat)", p, []))

    # round-4 wire-format encoders: all-Catalyst concat trees — the
    # encode must inline into WholeStageCodegen with no Python stage
    # and no shuffle beyond what the operator semantically needs
    p = plan_of(qs["syslog_encode"](spark, sf_dir))
    ok = (
        "MapInPandas" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and "hashpartitioning(" not in p  # only the _ep roundrobin
    )
    checks.append(
        ("syslog_encode: shuffle-free codegen projection (both RFC "
         "formats in one pass)", ok, "")
    )
    sections.append(("syslog_encode (wire-format projection)", p, []))

    p = plan_of(qs["influx_encode"](spark, sf_dir))
    n_exchanges = p.count("hashpartitioning(")
    ok = (
        "MapInPandas" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and n_exchanges == 1  # the sequence-tag window, nothing else
    )
    checks.append(
        ("influx_encode: one window exchange (sequence tag), "
         "encode itself shuffle-free", ok, f"{n_exchanges} exchanges")
    )
    sections.append(("influx_encode (line protocol + sequence window)", p, []))

    p = plan_of(qs["loki_encode"](spark, sf_dir))
    ok = (
        "MapInPandas" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and "hashpartitioning(" not in p
    )
    checks.append(("loki_encode: shuffle-free entry projection", ok, ""))

    p = plan_of(qs["builtin_parsers"](spark, sf_dir))
    # the regex extraction is codegen; %z/%b time parsing goes through
    # the Arrow-vectorized timeparse stage (one per format family) —
    # vectorized, never row-at-a-time
    ok = (
        "BatchEvalPython" not in p
        and len(re.findall(r"^\(\d+\) ArrowEvalPython", p, re.M)) <= 3
        and "CartesianProduct" not in p
        and "hashpartitioning(" not in p
    )
    checks.append(
        ("builtin_parsers: codegen regex + Arrow-batch time parse, "
         "no row-at-a-time Python, shuffle-free", ok, "")
    )

    p = plan_of(qs["statsd_parse"](spark, sf_dir))
    ok = (
        "MapInPandas" not in p
        and "BatchEvalPython" not in p
        and "ArrowEvalPython" not in p
        and "hashpartitioning(" not in p
    )
    checks.append(("statsd_parse: shuffle-free codegen parse", ok, ""))

    p = plan_of(qs["prom_text"](spark, sf_dir))
    ok = (
        "BatchEvalPython" not in p
        and "HashAggregate" in p
        and "CartesianProduct" not in p
    )
    checks.append(
        ("prom_text: map-side partial aggregate feeds the exposition "
         "projection", ok, "")
    )

    # session-2 round-4 queries: wire decoders are Arrow mapInPandas
    # with no shuffle around the decode; encoders stay in codegen
    p = plan_of(qs["syslog_parse"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p and "MapInPandas" not in p
          and "hashpartitioning(" not in p)
    checks.append(("syslog_parse: shuffle-free codegen parse", ok, ""))

    # (the round-robin REPARTITION_BY_NUM from _ep() is the deliberate
    # core-spread of one-file scans, not a data shuffle — only
    # hashpartitioning exchanges count against these checks)
    for q in ("http_encode", "azure_encode", "cloudwatch_encode"):
        p = plan_of(qs[q](spark, sf_dir))
        ok = ("BatchEvalPython" not in p and "MapInPandas" not in p
              and "hashpartitioning(" not in p)
        checks.append((f"{q}: shuffle-free codegen encoder", ok, ""))

    p = plan_of(qs["stackdriver_encode"](spark, sf_dir))
    ok = (len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1
          and "hashpartitioning(" not in p
          and "BatchEvalPython" not in p)
    checks.append(
        ("stackdriver_encode: single Arrow stage, no shuffle", ok, ""))

    for q in ("mqtt_decode", "forward_decode", "es_bulk_in",
              "otlp_logs_in"):
        p = plan_of(qs[q](spark, sf_dir))
        ok = ("hashpartitioning(" not in p
              and "BatchEvalPython" not in p
              and "CartesianProduct" not in p)
        checks.append(
            (f"{q}: wire decode fans out with no shuffle", ok, ""))

    p = plan_of(qs["collectd_decode"](spark, sf_dir))
    ok = ("partial" in p.lower() and "BatchEvalPython" not in p
          and p.count("hashpartitioning(") <= 1)  # the agg's own
    checks.append(
        ("collectd_decode: partial agg above the Arrow decode", ok, ""))

    p = plan_of(qs["remote_write_decode"](spark, sf_dir))
    ok = ("hashpartitioning(" not in p and "BatchEvalPython" not in p)
    checks.append(
        ("remote_write_decode: snappy+protobuf decode, no shuffle",
         ok, ""))

    p = plan_of(qs["prom_scrape"](spark, sf_dir))
    ok = ("BroadcastHashJoin" in p
          and "BroadcastNestedLoopJoin" not in p
          and "CartesianProduct" not in p)
    checks.append(
        ("prom_scrape: TYPE/HELP attach via broadcast equi-join "
         "(suffix expansion, no nested loop)", ok, ""))

    # round-5: the misc/out encoder gates — all pure-Catalyst string
    # assembly (to_json / format_string / concat), so the plan must be
    # shuffle-free codegen with zero Python stages
    for q in ("nats_encode", "logdna_encode", "slack_encode",
              "td_encode", "nrlogs_encode", "skywalking_encode",
              "plot_encode", "kafka_rest_encode", "kusto_encode",
              "websocket_encode"):
        p = plan_of(qs[q](spark, sf_dir))
        ok = ("BatchEvalPython" not in p and "MapInPandas" not in p
              and "ArrowEvalPython" not in p
              and "hashpartitioning(" not in p)
        checks.append((f"{q}: shuffle-free codegen encoder", ok, ""))

    # pgsql_insert groups records into per-tag chunk bodies: exactly
    # the groupBy's own exchange, object-hash aggregated (collect_list
    # has no partial-merge shortcut), still zero Python stages
    p = plan_of(qs["pgsql_insert"](spark, sf_dir))
    ok = (p.count("hashpartitioning(") == 1
          and "BatchEvalPython" not in p
          and "MapInPandas" not in p)
    checks.append(
        ("pgsql_insert: single exchange (the chunk groupBy), "
         "all-JVM statement assembly", ok, ""))

    # semdedup: Arrow centroid assignment, quadratic work confined to
    # one cell (equi-join on cell, never a cartesian), Arrow cumsum
    # cosine verify — no row-at-a-time Python anywhere
    p = plan_of(qs["semdedup"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("semdedup: within-cell equi-join pairs + single Arrow cosine "
         "verify, no cartesian", ok, ""))

    # late round-5 gates: kinesis/bigquery are pure-Catalyst string
    # assembly (shuffle-free codegen, partition key hash in decimal
    # expressions); otlp_logs_encode is Catalyst struct assembly with
    # exactly the grouping exchange plus ONE Arrow stage (the decode
    # half of the round-trip); http_in is one Arrow body-parse stage
    for q in ("kinesis_encode", "bigquery_encode",
              "influx_metrics_encode", "splunk_metrics_encode",
              "cloudwatch_emf_encode", "cmt_text_encode",
              "json_escape", "pack_dup_keys"):
        p = plan_of(qs[q](spark, sf_dir))
        ok = ("BatchEvalPython" not in p and "MapInPandas" not in p
              and "ArrowEvalPython" not in p
              and "hashpartitioning(" not in p)
        checks.append((f"{q}: shuffle-free codegen encoder", ok, ""))
    p = plan_of(qs["otlp_logs_encode"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "CartesianProduct" not in p
          and p.count("hashpartitioning(") == 1
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("otlp_logs_encode: one exchange (the resource/scope groupBy) "
         "+ one Arrow stage (the decode half)", ok, ""))
    p = plan_of(qs["http_in"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "hashpartitioning(" not in p
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("http_in: single Arrow body-parse stage, shuffle-free", ok, ""))
    p = plan_of(qs["ctr_text_encode"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p and "MapInPandas" not in p
          and "ArrowEvalPython" not in p
          and p.count("hashpartitioning(") == 1)
    checks.append(
        ("ctr_text_encode: all-Catalyst, exactly the one grouping "
         "exchange (sorted span collect per resource)", ok, ""))

    # otlp_traces_in: the traces walk is one Arrow stage over the
    # Catalyst-assembled bodies — decode parallelizes per input split
    # with zero exchanges
    p = plan_of(qs["otlp_traces_in"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "hashpartitioning(" not in p
          and "CartesianProduct" not in p
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("otlp_traces_in: single Arrow span-walk stage, shuffle-free",
         ok, ""))

    # otlp_traces_encode: Catalyst struct assembly with exactly the
    # resource groupBy's exchange plus ONE Arrow stage (the decode
    # half of the round-trip) — mirrors the otlp_logs_encode shape
    p = plan_of(qs["otlp_traces_encode"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "CartesianProduct" not in p
          and p.count("hashpartitioning(") == 1
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("otlp_traces_encode: one exchange (the resource groupBy) "
         "+ one Arrow stage (the decode half)", ok, ""))

    # otlp_metrics_in: protobuf payload synthesis + the cmetrics-style
    # decode are each one Arrow stage, pipelined per input split with
    # zero exchanges
    p = plan_of(qs["otlp_metrics_in"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "hashpartitioning(" not in p
          and "CartesianProduct" not in p
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 2)
    checks.append(
        ("otlp_metrics_in: two chained Arrow stages (synth + decode), "
         "shuffle-free", ok, ""))

    # otlp_metrics_encode: exactly the per-tag groupBy exchange feeding
    # the context builder (FlatMapGroupsInPandas) plus one Arrow decode
    # stage for the round-trip; the counters/hists union stays narrow
    p = plan_of(qs["otlp_metrics_encode"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "CartesianProduct" not in p
          and p.count("hashpartitioning(") == 1
          and len(re.findall(r"^\(\d+\) FlatMapGroupsInPandas", p, re.M))
          == 1
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("otlp_metrics_encode: one exchange (the tag groupBy) + one "
         "Arrow stage (the decode half)", ok, ""))

    # remote_write_encode: same shape — one explicit hash exchange on
    # the chunk key feeding the WriteRequest builder, one Arrow decode
    # stage for the round-trip, everything else narrow Catalyst
    p = plan_of(qs["remote_write_encode"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "CartesianProduct" not in p
          and p.count("hashpartitioning(") == 1
          and len(re.findall(r"^\(\d+\) FlatMapGroupsInPandas", p, re.M))
          == 1
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("remote_write_encode: one exchange (chunk groupBy) + one "
         "Arrow stage (the decode half)", ok, ""))

    # cmt_msgpack_encode: same chunked-export shape
    p = plan_of(qs["cmt_msgpack_encode"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "CartesianProduct" not in p
          and p.count("hashpartitioning(") == 1
          and len(re.findall(r"^\(\d+\) FlatMapGroupsInPandas", p, re.M))
          == 1
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("cmt_msgpack_encode: one exchange (chunk groupBy) + one "
         "Arrow stage (the decode half)", ok, ""))

    # ctr_msgpack_encode: same chunked-export shape
    p = plan_of(qs["ctr_msgpack_encode"](spark, sf_dir))
    ok = ("BatchEvalPython" not in p
          and "CartesianProduct" not in p
          and p.count("hashpartitioning(") == 1
          and len(re.findall(r"^\(\d+\) FlatMapGroupsInPandas", p, re.M))
          == 1
          and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
    checks.append(
        ("ctr_msgpack_encode: one exchange (chunk groupBy) + one "
         "Arrow stage (the decode half)", ok, ""))

    # in-round-5 gates: s3 key layout / fleet cpu math / meminfo /
    # socket framing are pure-Catalyst map-side plans (no Python, no
    # exchange — they parallelize per input split at any scale);
    # hec_json_parse / journal_export are each ONE Arrow parse stage
    for q in ("s3_key_format", "host_cpu_percent", "node_meminfo",
              "socket_framing", "nginx_status"):
        p = plan_of(qs[q](spark, sf_dir))
        ok = ("BatchEvalPython" not in p and "MapInPandas" not in p
              and "ArrowEvalPython" not in p
              and "hashpartitioning(" not in p)
        checks.append((f"{q}: shuffle-free all-Catalyst map plan", ok, ""))
    for q in ("hec_json_parse", "journal_export"):
        p = plan_of(qs[q](spark, sf_dir))
        ok = ("BatchEvalPython" not in p
              and "hashpartitioning(" not in p
              and len(re.findall(r"^\(\d+\) MapInPandas", p, re.M)) == 1)
        checks.append(
            (f"{q}: single Arrow parse stage, shuffle-free", ok, ""))

    out = ["# PLANS — physical-plan evidence (generated by tools/explain_plans.py)\n"]
    out.append("## Automated checks\n")
    for name, ok, detail in checks:
        out.append(f"- [{'x' if ok else ' '}] {name}" + (f" — {detail}" if detail else ""))
    out.append("\n")
    for title, plan, _notes in sections:
        out.append(f"## {title}\n\n```\n{plan.strip()}\n```\n")
    Path(os.path.join(os.path.dirname(__file__), "..", "PLANS.md")).write_text(
        "\n".join(out)
    )
    bad = [c for c in checks if not c[1]]
    print("\n".join(f"{'OK ' if ok else 'FAIL'} {n} {d}" for n, ok, d in checks))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
