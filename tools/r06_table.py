#!/usr/bin/env python3
"""Build the OPTIMIZATION_r06.md per-query table from the session baseline
and final bench JSON lines (same methodology as the frozen driver bench)."""
import json, sys

base = json.load(open(sys.argv[1]))["queries"]
fin = json.load(open(sys.argv[2]))["queries"]

# what was done per query (change id from OPTIMIZATION_r06.md), or why left
C = {}
def tag(names, note):
    for n in names: C[n] = note

tag(["vaep_ml_rate"],
    "#1 narrowed cache + concurrent pair fit + scale-adaptive partitions; #15 frozen-walker predict")
tag(["atomic_vaep_ml_rate"],
    "#1 (pair fit); #15 frozen-walker predict; #16 typed atomic chain upstream")
tag(["xg_rate_gbt"], "#1 narrowed cache + scale-adaptive partitions; #15 frozen-walker predict")
tag(["stream_vocab_from_tokens", "stream_dedup_exact", "stream_dedup_watermarked",
     "stream_dedup_tws", "stream_pack_chunks", "stream_pack_chunks_tws"],
    "#2 scale-adaptive shuffle/state parallelism")
tag(["dedup_clusters"], "#3 fused init + monotone-sum convergence; #4 via jaccard edges")
tag(["dedup_ngram_jaccard"], "#4 map-only shingle sizes (4->2 exchanges)")
tag(["tokens_oov_stats"], "#5 TakeOrdered top-k + map-only OOV pass (3->1 exchanges, window gone); #11 persist")
tag(["tokens_lm_perplexity"], "#6 self-scored single stream join; #11 persist")
tag(["curation_ccnet"], "#6 via lmScore; survivor persist pre-existing")
tag(["dedup_embedding_cosine", "sim_ivf_ann", "sim_lsh_ann", "sim_cosine_scores",
     "sim_bruteforce_topk"], "#7 FoldDot codegen restored (was interpreted fallback)")
tag(["convert_statsbomb_full"], "#8 parse extra bag once (~100 -> 2 from_json in plan)")
tag(["xt_rate", "xt_rate_grid", "xt_rate_interp", "xt_rate_interp_ref",
     "xt_fit_surface", "xt_value_iteration", "stream_rated_sink"],
    "#9 fused one-pass XThreat.fit (2 collect jobs -> 1)")
tag(["atomic_convert_full", "atomic_vaep_ltr", "atomic_vaep_labels",
     "atomic_vaep_formula", "atomic_vaep_goalscore", "atomic_vaep_features"],
    "#16 typed per-game atomic scan (8 windows/7 sorts/4 explodes -> 1 pass)")
tag(["stream_cep_batch", "stream_cep_from_tokens"],
    "#14 allocation-free lookahead in the typed CEP scan")
tag(["tokens_decontaminate"], "#10 levers opt-in (probe only); #11 persist")
tag(["tokens_span_cut"], "#11 persist; #12 countDistinct single exchange")
tag(["tokens_repetition_stats", "tokens_lm_perplexity_heldout"], "#11 one-slot token persist")
tag(["q7_asof_join_bucketed"], "advice: HLL margin + post-collect guard (no plan change)")
# examined, deliberately left alone
LEFT = {
    "convert_wyscout_full": "examined: 1 exchange, 7 windows, map-only dispatch; cost is per-row when-chain CPU + mandated resorts",
    "convert_kloppy_full": "examined: 1 exchange, qualifier-array dispatch map-only; same",
    "convert_opta_full": "examined: same single-exchange window-chain shape",
    "dedup_simhash_pairs": "examined: md5-per-token vote pass is the cost; single posting shuffle, in-plan cap",
    "dedup_minhash_lsh": "examined: one signature shuffle, capped banding; verify joins bounded by candidates",
    "dedup_exact": "spillable window form, 1 exchange — by design",
    "tokens_dup_spans": "single-pass rolling-hash kernel + one win_hash window",
    "tokens_longest_dup_span": "dupSpans + two bounded windows",
    "tokens_pack_chunks": "two-phase prefix-sum packing; meta persist pre-existing",
    "tokens_pack_chunks_eos": "same packing machinery",
    "tokens_pack_chunks_bounds": "same packing machinery",
    "tokens_bigrams": "one partial-agg shuffle",
    "tokens_vocab_stats": "one partial-agg shuffle (tf/df)",
    "tokens_hash_split": "map-only",
    "tokens_quality_filter": "map-only",
    "tokens_sample_stratified": "one window shuffle on source",
    "tokens_source_mix": "tiny-summary exchanges only; corpus map-only",
    "multimodal_decode": "ImageIO/codec CPU; batched mapPartitions",
    "multimodal_decode_4fmt": "ImageIO/codec CPU; batched mapPartitions",
    "multimodal_features": "map-only",
    "stream_tokens_roundtrip": "codec quantization roundtrip, map-only",
    "stream_windowed_team_stats": "tumbling-window agg, 1 exchange",
    "stream_assist_candidates": "interval join, bounded",
    "q7_asof_join": "single marked-union window — by design",
    "q1_agg": "TPC-shaped agg, partial-agg shuffle",
    "q2_join_agg": "broadcast dim join",
    "q3_topk_window": "per-key top-k window",
    "q4_semi_join": "semi join",
    "q5_filter_pushdown": "scan + pushed filters",
    "q6_events_sessionize": "session window",
    "vaep_rate_gbt_frozen": "frozen-tree predict, 1 exchange chain",
    "xg_rate_gbt_frozen": "frozen-tree predict over shot features",
    "xg_rate_logistic": "frozen-coefficient logistic",
    "xg_shots_features": "ltr + shot-state windows",
    "xg_player_totals": "shot features + one agg",
    "xg_naive_baseline": "closed-form counts",
    "vaep_rate_logistic": "frozen logistic",
    "vaep_player_rating": "formula + per-player agg",
    "xt_cell_stats": "one agg pass (operator itself unchanged; fit fusing is fit-only)",
    "xt_scoring_action_prob": "one agg",
    "xt_transition_matrix": "two aggs + join — the declared operator shape",
}

rows = []
for k in sorted(base):
    b, f = base[k], fin.get(k, float("nan"))
    note = C.get(k) or LEFT.get(k) or "window-chain operator, 1 exchange; left alone (floor-bound)"
    rows.append((k, b, f, note))

print("| query | r06 baseline s | r06 final s | Δ | action |")
print("|---|---|---|---|---|")
for k, b, f, note in rows:
    print(f"| {k} | {b:.2f} | {f:.2f} | {f-b:+.2f} | {note} |")

tb = sum(r[1] for r in rows); tf = sum(r[2] for r in rows)
print(f"\nTotal: {tb:.1f} -> {tf:.1f} s ({(tb-tf)/tb*100:.0f}% faster)")
