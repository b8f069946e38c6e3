"""Driver-window registry invariants: the driver records correctness rows
for the first 50 QUERIES entries only, so the curated window must stay
exactly 50 and keep one representative of every operator family inside."""

from xcube_geodb_spark.suite import DRIVER_WINDOW, ORACLES, QUERIES

FAMILIES = {
    # r10: scan_filter_eq_gt demotes (eq/gt comparators are a subset of
    # the combined grammar gate); scan_filter_grammar is the family rep
    "scan": "scan_filter_grammar",
    "grammar-union": "scan_filter_grammar",
    "fts": "scan_fts_documents",
    # json extraction — r10: pg_json_arrows (PG ->/->>/#>/#>> chains +
    # typed paren-casts through the pg shim) supersedes
    # events_json_extract as the family rep; the grammar arrow-select
    # variant stays registered + locally verified
    "json-extract": "pg_json_arrows",
    "pg": "pg_groupby_q1",
    "join": "join_revenue_by_nation",
    "skew": "skew_salted_join_revenue",
    "window": "window_top_order_per_customer",
    "rollup": "rollup_lineitem",
    "events": "events_tumbling_hour",
    "asof": "events_asof_prev",
    "stream-ingest": "stream_ingest_collection",
    "stream-cdc": "stream_cdc_feed",
    # r7: the prepared-geometry chain covers measures (area/centroid/x/y)
    # plus the st_prepare struct path; geo_measures_squares demotes but
    # stays locally verified
    "geo-measures": "geo_prepared_chain",
    "geo-modes": "geo_bbox_modes",
    "geo-crs": "geo_bbox_crs_transform",
    # distance top-k demoted r5: ordering covered by scan_paging /
    # geo_knn_join, distance scalars by geo_distance_sphere; the new
    # general-overlay kernel takes the slot
    # r10: pg_geography_distance (::geography shim + haversine kernel +
    # DWithin predicate) supersedes geo_distance_sphere as the
    # great-circle rep; the JVM column-algebra twin stays locally
    # verified
    "geo-distance": "pg_geography_distance",
    "geo-overlay": "geo_overlay_diamond",
    # r9 session 2: exact dedup is the first leg of dedup_pipeline_kept
    # (still in the window); the freed slot carries SemDeDup
    "dedup-exact": "dedup_pipeline_kept",
    "dedup-semantic": "dedup_semantic_kept",
    "dedup-lsh": "dedup_minhash_pairs",
    # corpus-level line dedup (CCNet/RefinedWeb): promoted over the
    # scan_cs_cd_tokens grammar variant (family rep: scan_filter_grammar)
    "dedup-lines": "dedup_lines_rebuilt",
    # simhash / embedding near-dup / sign-lsh are demoted variants: the
    # dedup trio, cosine family, and the lsh-backed warehouse ANN index
    # keep their families driver-verified
    "dedup-pipeline": "dedup_pipeline_kept",
    "sim-brute": "sim_cosine_topk",
    # r5: the composed IVF-PQ warehouse probe supersedes the direct ivf
    # scan as the family representative (same seeded coarse quantizer and
    # probing, plus PQ codes at rest and footer file-pruning);
    # sim_ivf_topk stays registered and locally verified
    "sim-ivf": "ann_ivfpq_topk",
    # r9: sim_knn_join demoted — the batch variant shares
    # sim_cosine_topk's np.stack matrix scorer; it stays registered and
    # locally verified, the brute-cosine rep carries the family
    "sim-knn-join": "sim_cosine_topk",
    "ann-index": "ann_index_topk",
    "attribution": "events_attribution",
    "geo-sphere": "pg_geography_distance",
    # geometry aggregation rep is now the two-level dissolve (same
    # closed-form chain fixture as geo_dissolve_chain PLUS the
    # unbounded-group valve); chain + collect variants stay registered
    # and locally verified
    "geo-collect": "geo_dissolve_two_level",
    "geo-spatial-join": "geo_spatial_join_points",
    "geo-knn-join": "geo_knn_join",
    "retrieval": "text_bm25_join",
    "sketch": "sketch_token_freq",
    # r11: corpus_cap_per_source demoted for pg_jsonb_merge; the cap is
    # a per-source deterministic-rank cut whose machinery (seeded hash
    # ordering + window rank) sample_split_documents keeps in-window —
    # it stays registered + locally verified
    "curation-cap": "sample_split_documents",
    "text": "text_profile",
    "multimodal": "multimodal_decode",
    "sampling": "sample_split_documents",
    "packing": "pack_documents_budget",
    "dml": "dml_delete_update_roundtrip",
    "dml-upsert": "dml_upsert_roundtrip",
    "dml-compact": "dml_compact_roundtrip",
    "dml-time-travel": "dml_time_travel_roundtrip",
    "dml-changes": "dml_changes_feed",
}


class TestDriverWindow:
    def test_window_is_exactly_fifty(self):
        assert len(DRIVER_WINDOW) == 50

    def test_queries_start_with_window(self):
        assert list(QUERIES)[:50] == DRIVER_WINDOW

    def test_every_family_inside_window(self):
        inside = set(DRIVER_WINDOW)
        missing = {f: q for f, q in FAMILIES.items() if q not in inside}
        assert not missing, f"families outside driver window: {missing}"

    def test_every_window_entry_has_oracle(self):
        assert all(n in ORACLES for n in DRIVER_WINDOW)

    def test_all_entries_registered(self):
        assert all(n in QUERIES for n in DRIVER_WINDOW)
