"""Large-scale data-pipeline operators (dedup, similarity, text,
multimodal) — first-class components beyond the reference's surface."""
