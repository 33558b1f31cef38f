"""gluestick_spark — PySpark-native ETL engine with gluestick's capabilities.

Re-expresses hotgluexyz/gluestick (pandas/polars ETL utilities for the
Singer protocol) as lazy Spark DataFrame transformations, plus
large-scale LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).
"""

from .session import get_spark
from .schema import (
    json_schema_to_spark_type,
    json_schema_to_struct,
    spark_type_to_json_schema,
    struct_to_json_schema,
    combine_anyof_types,
)
from .sources.reader import Reader, read_csv_folder, read_parquet_folder, read_snapshots
from .operators.restructure import (
    explode_json_to_rows,
    explode_json_to_cols,
    compress_rows_to_col,
    json_tuple_to_cols,
    enforce_exploded_col_types,
    clear_normalization_cache,
)
from .operators.project import (
    rename,
    pluck_fields,
    pluck_fields_by_regex,
    custom_fields_expr,
    array_to_dict_expr,
    array_to_dict_reducer,
    drop_all_null_columns,
)
from .operators.mapping import map_fields_df, read_tenant_custom_mapping, should_map_table
from .config import (
    JobDirs,
    get_job_dirs,
    read_config,
    get_config_value,
    exception,
    establish_directories,
    load_config_json,
)
from .validation import validate_records, split_valid_invalid
from .records import (
    CustomValidationError,
    map_fields,
    process_custom_fields,
    localize_record_datetimes,
    get_model_datetime_fields,
    validate_model,
    handle_validation_error,
    get_row_hash,
    parse_objs,
)
from .operators.asof import asof_join, range_join
from .operators.rollup import time_rollup
from .operators.union import union_relaxed, keep_last, widest_common_type
from .operators.snapshot import (
    snapshot_records,
    drop_redundant,
    merge_id_from_snapshot,
    upsert,
    prepare_snapshot_write,
    finish_snapshot_write,
)
from .functions.hashing import row_hash_expr, with_row_hash
from .functions.cleaning import (
    remove_nulls_deep,
    clean_convert,
    clean_obj_null_values,
    deep_convert_datetimes,
)
from .functions.datetimes import localize_datetime, ns_to_timestamp
from .functions.casting import cast_expr, cast_df_to_schema
from .functions.strings import format_str_safely, build_string_format_variables, get_index_safely
from .sinks.singer import to_singer, write_schema, write_record, write_state, gen_singer_header
from .sinks.singer_schema import (
    to_singer_schema,
    unwrap_json_schema,
    get_catalog_schema,
    parse_df_cols,
)
from .sinks.export import to_export
from .compat import (
    pandas_df_to_export,
    pandas_df_to_singer,
    polars_df_to_export,
    polars_df_to_singer,
    polars_lf_to_export,
    polars_lf_to_singer,
    PolarsReader,
    PLLazyFrameReader,
    map_pd_type_to_polars,
    cast_df_from_schema,
    cast_lf_from_schema,
    gen_singer_header_from_polars_schema,
)

# Beyond-reference surface (SURVEY §2.13): warehouse/temporal/state ops …
from .operators.cdc import table_diff
from .operators.scd2 import scd2_merge
from .operators.skew import salted_join
from .operators.merge import merge_into
from .operators.expectations import check_expectations
from .operators.profile import profile_numeric, histogram, table_stats, correlation_matrix
from .operators.grouping import top_k_per_group, grouped_percentiles
from .operators.features import equi_depth_bin, scale_features, clip_outliers
from .operators.gapfill import fill_gaps
from .operators.sessions import sessionize_batch, suppress_duplicates
from .operators.anomaly import rolling_zscore
from .operators.cohorts import retention_matrix
from .operators.funnels import funnel_counts, funnel_times
from .operators.versioned import (
    write_versioned,
    read_versioned,
    list_versions,
    published_versions,
    latest_version,
    vacuum_versions,
)
from .sinks.layout import (
    write_sorted,
    write_bucketed,
    write_zordered,
    zvalue_expr,
    write_hive_partitioned,
    compact_files,
)

# … and the LLM-corpus family.
from .llm.dedup import (
    exact_dedup,
    minhash_dedup,
    cross_corpus_near_dup_pairs,
    dedup_against,
    materialize_band_index,
    dedup_against_indexed,
    cross_corpus_near_dup_pairs_indexed,
    simhash_near_dups,
    embedding_near_dups,
    connected_components,
    cluster_dedup,
    cluster_dedup_by,
    cluster_size_histogram,
)
from .llm.spans import (
    segment_dedup,
    substring_overlap_spans,
    substring_dedup,
    materialize_substring_index,
    substring_spans_against,
)
from .llm.fuzzy import edit_distance_pairs
from .llm.sketch import kmv_distinct, kmv_sketch, kmv_merge, kmv_estimate, heavy_hitters
from .llm.sketch import kll_sketch, kll_merge, kll_quantiles
from .llm.similarity import (
    cosine_topk,
    lsh_ann_topk,
    ivf_topk,
    ivf_append,
    quantize_embeddings,
    dequantize_expr,
    pool_embeddings,
)
from .llm.retrieval import bm25_topk, tfidf_vectors
from .llm.text import (
    chunk_documents,
    build_vocab,
    bpe_pair_counts,
    encode_tokens,
    unigram_nll,
    bigram_nll,
)
from .llm.bpe import train_bpe, apply_bpe
from .llm.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
    balance_classes,
    resample_to_ratio,
    mix_corpora,
    negative_pairs,
    priority_sample,
    shuffle_write,
    unimax_sample,
)
from .llm.pii import redact_pii_expr
from .llm.web import (
    parse_url_expr,
    host_expr,
    registered_domain_expr,
    with_registered_domain,
    domain_stats,
    cap_per_domain,
)
from .llm.repetition import repetition_stats
from .llm.bloom import bloom_words, bloom_prefilter, should_prefilter
from .llm.decontam import contamination_pairs, decontaminate
from .llm.packing import pack_documents
from .llm.cluster import (
    kmeans,
    semdedup,
    semdedup_against,
    ivf_topk_exact,
    quantize_vec_expr,
    int_dot_expr,
    sq_ivf_topk,
    materialize_sq_ivf,
    sq_ivf_append,
    sq_ivf_topk_indexed,
)
from .llm.classifier import classifier_score, hashed_ngrams_expr
from .llm.pq import train_pq, encode_pq, pq_topk, adc_table
from .llm.rebalance import (
    cell_sizes,
    ivf_rebalance,
    sq_ivf_rebalance,
    pq_ivf_rebalance,
)
from .llm.text import collocations
from .llm.text import train_lang_id_ft, lang_id_ft, lang_id_ft_expr
from .llm.multimodal import (
    banded_hamming_pairs,
    audio_near_dups,
    audio_cluster_dedup,
    compute_audio_fingerprint,
    phash_near_dups,
    phash_cluster_dedup,
)
from .operators.graph import pagerank, triangle_count, hits
from .operators.sessions import transition_matrix
from .streaming.pipeline import (
    streaming_fingerprint_dedup,
    streaming_quantiles,
    compact_sketch_log,
)

__version__ = "0.1.0"
