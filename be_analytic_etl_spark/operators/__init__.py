"""Engine operators: consolidation, dedup, similarity, text analysis."""
