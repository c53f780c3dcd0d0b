"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — first-class components alongside the
SURVEY §2 operator surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from event_stream_spark.datapipe.dedup import (  # noqa: F401
    DEDUP_CLUSTERS_SQL,
    DEDUP_EMBEDDING_EXACT_SQL,
    DEDUP_EMBEDDING_SQL,
    DEDUP_EXACT_SQL,
    DEDUP_MINHASH_SQL,
    DEDUP_NGRAM_JACCARD_SQL,
    DEDUP_SIMHASH_PAIRS_SQL,
    DEDUP_SIMHASH_SQL,
    connected_components,
    dedup_clusters,
    dedup_embedding,
    dedup_embedding_exact,
    dedup_exact,
    dedup_minhash,
    dedup_ngram_jaccard,
    dedup_simhash,
    embedding_lsh_pairs,
    embedding_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_df,
    simhash_near_pairs,
)
from event_stream_spark.datapipe.corpusops import (  # noqa: F401
    CORPUS_MIX_SQL,
    DECONTAMINATE_SQL,
    DUP_SPANS_SQL,
    LM_SCORE_SQL,
    PII_SCRUB_SQL,
    TEXT_REPETITION_SQL,
    TFIDF_TOPTERMS_SQL,
    VOCAB_TOPK_SQL,
    corpus_mix,
    decontaminate,
    dup_spans,
    lm_score,
    pii_scrub,
    text_repetition,
    tfidf_topterms,
    vocab_topk,
)
from event_stream_spark.datapipe.packing import (  # noqa: F401
    CHUNK_DOCS_SQL,
    SEQ_PACK_SQL,
    chunk_docs,
    seq_pack,
)
from event_stream_spark.datapipe.pipeline import (  # noqa: F401
    DATAPIPE_CLEAN_SQL,
    datapipe_clean_corpus,
)
from event_stream_spark.datapipe.similarity import (  # noqa: F401
    ANN_IVF_SQL,
    ANN_LSH_SQL,
    ANN_TOPK_SQL,
    EMBED_KMEANS_SQL,
    EMBED_QUANTIZE_SQL,
    SEMDEDUP_SQL,
    ann_ivf_topk,
    ann_lsh_topk,
    ann_topk_brute,
    embed_kmeans,
    embed_quantize,
    ivf_assignments,
    semdedup,
)
from event_stream_spark.datapipe.webops import (  # noqa: F401
    DEDUP_INCREMENTAL_SQL,
    DEDUP_PARAGRAPH_SQL,
    URL_DEDUP_SQL,
    canonicalize_url,
    dedup_incremental,
    dedup_paragraph,
    url_dedup,
)
from event_stream_spark.datapipe.multimodal import (  # noqa: F401
    media_from_documents,
    multimodal_meta,
)
from event_stream_spark.datapipe.textstats import (  # noqa: F401
    TEXT_FINGERPRINT_SQL,
    TEXT_LANGID_SQL,
    TEXT_QUALITY_SQL,
    TEXT_TOKENS_SQL,
    text_fingerprint,
    text_langid,
    text_quality,
    text_tokens,
)

DATAPIPE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_exact": dedup_exact,
    "dedup_minhash": dedup_minhash,
    "dedup_clusters": dedup_clusters,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_pairs": simhash_near_pairs,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_embedding": dedup_embedding,
    "dedup_embedding_exact": dedup_embedding_exact,
    "ann_topk_brute": ann_topk_brute,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "embed_kmeans": embed_kmeans,
    "semdedup": semdedup,
    "text_tokens": text_tokens,
    "text_quality": text_quality,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "multimodal_meta": multimodal_meta,
    "datapipe_clean_corpus": datapipe_clean_corpus,
    "decontaminate": decontaminate,
    "corpus_mix": corpus_mix,
    "vocab_topk": vocab_topk,
    "tfidf_topterms": tfidf_topterms,
    "pii_scrub": pii_scrub,
    "text_repetition": text_repetition,
    "dup_spans": dup_spans,
    "seq_pack": seq_pack,
    "chunk_docs": chunk_docs,
    "url_dedup": url_dedup,
    "dedup_paragraph": dedup_paragraph,
    "dedup_incremental": dedup_incremental,
    "embed_quantize": embed_quantize,
    "lm_score": lm_score,
}

DATAPIPE_ORACLE_SQL: dict[str, str] = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_minhash": DEDUP_MINHASH_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_simhash_pairs": DEDUP_SIMHASH_PAIRS_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_JACCARD_SQL,
    "dedup_embedding": DEDUP_EMBEDDING_SQL,
    "dedup_embedding_exact": DEDUP_EMBEDDING_EXACT_SQL,
    "ann_topk_brute": ANN_TOPK_SQL,
    "ann_lsh_topk": ANN_LSH_SQL,
    "ann_ivf_topk": ANN_IVF_SQL,
    "embed_kmeans": EMBED_KMEANS_SQL,
    "semdedup": SEMDEDUP_SQL,
    "text_tokens": TEXT_TOKENS_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "text_langid": TEXT_LANGID_SQL,
    "text_fingerprint": TEXT_FINGERPRINT_SQL,
    "datapipe_clean_corpus": DATAPIPE_CLEAN_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    "corpus_mix": CORPUS_MIX_SQL,
    "vocab_topk": VOCAB_TOPK_SQL,
    "tfidf_topterms": TFIDF_TOPTERMS_SQL,
    "pii_scrub": PII_SCRUB_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
    "dup_spans": DUP_SPANS_SQL,
    "seq_pack": SEQ_PACK_SQL,
    "chunk_docs": CHUNK_DOCS_SQL,
    "url_dedup": URL_DEDUP_SQL,
    "dedup_paragraph": DEDUP_PARAGRAPH_SQL,
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
    "embed_quantize": EMBED_QUANTIZE_SQL,
    "lm_score": LM_SCORE_SQL,
    # rows-only (non-SQL-expressible or engine-specific):
    #   multimodal_meta (mapInPandas binary sniffing — no SQL twin)
}
