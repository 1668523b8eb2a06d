from .nw_path import (
    Step,
    nw_score_oracle,
    nw_align_oracle,
    PathAlignment,
    batched_best_scores,
)
