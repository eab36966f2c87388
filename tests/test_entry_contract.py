"""Driver-contract smoke: entry() returns rows; queries()/oracle_sql() align."""

from __future__ import annotations

import importlib.util
import os


def _load_entry():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_contract(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert df.count() > 0
    assert "orderYear" in df.columns

    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 21
    assert set(oracles) <= set(qs)
    # every deterministic query has an oracle; approximate ones are the
    # documented exceptions
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(mod.ROWS_ONLY_RATIONALE)
    # round 7: minhash/simhash/embedding_dedup pairs moved to full
    # oracles via the md5-portable signature mode; round 8:
    # wordpiece_token_stats moved to a full oracle (recursive-CTE
    # greedy walk); round 9 adds zorder_skipping_stats (a physical
    # file-layout metric no SQL over the logical table can express);
    # round 11 moved media_decode_stats / media_frames_stats to FULL
    # oracles (generate_series over the integer pixel/sample
    # formulas) — leaving only the genuinely iterative/approximate/
    # physical
    assert rows_only == {"lsh_ann_topk",
                         "lsh_index_topk", "ivf_index_topk",
                         "pq_ann_topk", "semdedup_pairs",
                         "semantic_contamination_pairs",
                         "events_sketch_stats",
                         "bpe_merge_table", "bpe_token_stats",
                         "unigram_vocab", "unigram_token_stats",
                         "zorder_skipping_stats"}
