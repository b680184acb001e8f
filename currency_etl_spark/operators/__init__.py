"""Engine operators that aren't plain catalog queries: multimodal column
plumbing, plus re-exports of the dedup/similarity query families."""
