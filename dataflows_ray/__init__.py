"""dataflows_ray — a Ray-Data-native data-processing engine.

From-scratch re-expression of the datahq/dataflows capability surface
(chainable flow steps over named resources) as lazy ``ray.data.Dataset``
pipelines: Arrow batches, actor pools for stateful stages, native
groupby/sort/join shuffles, streaming execution with backpressure.
"""

from ray.data.context import DataContext as _DataContext, ShuffleStrategy as _ShuffleStrategy

# Engine-wide shuffle policy: HASH_SHUFFLE. Keyed repartition (the engine's
# aggregation/dedup backbone, stages/agg.py) requires it, it is the
# cluster-correct strategy for keyed exchanges (no range sampling pass),
# and Dataset.join uses the same hash-aggregator machinery either way.
# Sort / random_shuffle are planned independently and are unaffected.
_ctx = _DataContext.get_current()
_ctx.shuffle_strategy = _ShuffleStrategy.HASH_SHUFFLE
# Bound the default aggregator-actor pool for keyed ops that don't pass an
# explicit partition count (Ray's default of 200 actors OOMs small nodes;
# hot paths size partitions themselves via stages.agg.shuffle_partitions).
_ctx.default_hash_shuffle_parallelism = 32

# Shim two Ray 2.49 empty-block schema-loss warts (see core/raycompat.py):
# without it, zero-row blocks degrade to zero-COLUMN blocks and schema-
# changing map stages emit mixed-schema streams (round-1 q06 root cause).
from .core import raycompat as _raycompat
_raycompat.apply()

from .core.flow import Flow, Step, row_fn, rows_fn, package_fn
from .core.package import EnginePackage, PackageStream, ResourceDescriptor
from .core.exceptions import FlowError, StepError, ValidationError
from .sources.load import load, iterable_loader, read_parquet_with_row_ids, ROW_ID
from .stages.fields import (
    add_field, add_computed_field, select_fields, delete_fields,
    rename_fields, derive)
from .stages.filtering import filter_rows, find_replace
from .stages.schema_ops import (
    set_type, validate, update_package, add_metadata, update_resource,
    update_schema, set_primary_key)
from .stages.reshape import (
    unpivot, concatenate, duplicate, delete_resource, sources, conditional,
    update_stats, finalizer, printer)
from .stages.sort import sort_rows
from .stages.dedup import deduplicate
from .stages.join import join, join_with_self
from .stages.asof import asof_join
from .stages.rangejoin import range_join
from .stages.setops import (
    top_k, grouped_top_k, set_intersect, set_except, pivot_table,
    detect_sequence)
from .stages.agg import (grouped_aggregate, rollup_aggregate,
                         grouping_sets_aggregate, cube_aggregate)
from .stages.analytic import ordered_prefix_sum, keyed_window
from .stages.sampling import (hash_sample, stratified_sample,
    train_val_test_split)
from .stages.semijoin import semi_join_ids
from .stages.reshape import unnest_list
from .functions.quantiles import (exact_quantiles,
                                  grouped_exact_quantile,
                                  quantile_bucket_stats)
from .functions.components import connected_components, dedup_by_components
from .functions.dedup import (
    exact_dedup, minhash_dedup, ngram_jaccard_dedup, simhash_signatures)
from .functions.text import (
    analyze_text, token_count_vectorized, redact_patterns, chunk_tokens,
    normalize_text, repetition_signals, ngram_contamination)
from .stages.sampling import hash_stratified_sample, weighted_source_sample
from .functions.editdist import edit_distance
from .functions.kmeans import kmeans_fit, kmeans_predict, kmeans_fit_predict
from .functions.bpe import learn_bpe, bpe_encode_stage
from .functions.pca import pca_fit, pca_project, grouped_embedding_mean
from .functions.retrieval import bm25_topk
from .functions.audio_ops import (resample_stage, vad_stage,
                                  loudness_normalize_stage,
                                  audio_qc_stage, mixdown_stage)
from .stages.bloomjoin import bloom_semi_join
from .functions.histq import hist_quantiles, histogram_counts
from .functions.lmscore import unigram_logprob, term_counts
from .sinks.dump import dump_to_path, dump_to_zip
from .sinks.checkpoint import checkpoint
from .sinks.stream_file import stream, unstream, parallelize
from .sinks.sql import dump_to_sql

__all__ = [
    "Flow", "Step", "row_fn", "rows_fn", "package_fn",
    "EnginePackage", "PackageStream", "ResourceDescriptor",
    "FlowError", "StepError", "ValidationError",
    "load", "iterable_loader", "read_parquet_with_row_ids", "ROW_ID",
    "add_field", "add_computed_field", "select_fields", "delete_fields",
    "rename_fields", "derive", "filter_rows", "find_replace",
    "set_type", "validate", "update_package", "add_metadata",
    "update_resource", "update_schema", "set_primary_key",
    "unpivot", "concatenate", "duplicate", "delete_resource", "sources",
    "conditional", "update_stats", "finalizer", "printer",
    "sort_rows", "deduplicate", "join", "join_with_self", "asof_join",
    "range_join", "top_k", "grouped_top_k", "set_intersect",
    "set_except", "pivot_table", "detect_sequence", "keyed_window",
    "hash_sample", "stratified_sample", "train_val_test_split", "semi_join_ids", "unnest_list",
    "exact_quantiles", "grouped_exact_quantile", "connected_components",
    "dedup_by_components", "rollup_aggregate",
    "grouping_sets_aggregate", "cube_aggregate",
    "quantile_bucket_stats", "loudness_normalize_stage",
    "learn_bpe", "bpe_encode_stage", "pca_fit", "pca_project", "grouped_embedding_mean",
    "mixdown_stage", "ordered_prefix_sum", "bm25_topk",
    "audio_qc_stage",
    "exact_dedup", "minhash_dedup", "ngram_jaccard_dedup",
    "simhash_signatures",
    "analyze_text", "token_count_vectorized", "redact_patterns",
    "chunk_tokens", "normalize_text", "repetition_signals",
    "ngram_contamination", "hash_stratified_sample",
    "weighted_source_sample",
    "edit_distance", "kmeans_fit", "kmeans_predict",
    "kmeans_fit_predict", "resample_stage", "vad_stage",
    "bloom_semi_join", "hist_quantiles", "histogram_counts",
    "unigram_logprob", "term_counts",
    "grouped_aggregate", "dump_to_path", "dump_to_zip", "checkpoint",
    "stream", "unstream", "parallelize", "dump_to_sql",
]

__version__ = "0.1.0"
