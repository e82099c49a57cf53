"""Activation-aware expert prediction.

Same math as the reference ExpertPredictor
(/root/reference/moe_infinity/memory/expert_predictor.py:17-35): update the
sequence's EAM, find the most-similar historical matrix, zero the past, and
apply a linear layer-distance decay `-(x - l)/(L + 1) + 1` so nearer layers
score higher. Output is a [L, E] score matrix over future layers.

Beyond the reference: the next layer's row is sharpened with measured
inter-layer expert AFFINITY — P(expert at l+1 | experts routed at l) from
the tracer's transition counts (which the reference records via
children_visit_cnt but never feeds back into prefetch; exploiting them is
the core idea of arXiv:2401.08383). The blend keeps the row's magnitude so
the global flat ranking across layers stays comparable.
"""

from __future__ import annotations

import numpy as np

from moe_infinity_tpu.memory.tracer import ExpertTracer


class ExpertPredictor:
    def __init__(self, tracer: ExpertTracer, affinity_weight: float = 0.5):
        self.tracer = tracer
        self.num_layers = tracer.num_layers
        self.num_experts = tracer.num_experts
        self.affinity_weight = float(affinity_weight)

    def predict(
        self, seq_id: str, expert_ids: np.ndarray, layer_idx: int
    ) -> np.ndarray:
        """Record this layer's routing and return predicted activation
        scores for layers >= layer_idx ([L, E] float32, zeros for the past)."""
        self.tracer.update_entry(seq_id, expert_ids, layer_idx)
        score = self.predict_from(seq_id, layer_idx)
        w = self.affinity_weight
        if w > 0 and layer_idx + 1 < self.num_layers:
            t = self.tracer.transitions[layer_idx]  # [E, E] counts
            rows = t[np.unique(np.asarray(expert_ids).reshape(-1))]
            total = rows.sum()
            if total > 0:
                aff = rows.sum(axis=0) / total  # P(expert at l+1)
                nr = score[layer_idx + 1]
                # rescale the distribution to the row's magnitude so the
                # blended row ranks comparably in the flat cross-layer sort
                amax = aff.max()
                scale = nr.max() if nr.max() > 0 else 1.0
                score[layer_idx + 1] = (1.0 - w) * nr + w * (
                    aff / (amax or 1.0)
                ) * scale
        return score

    def predict_from(self, seq_id: str, from_layer: int = 0) -> np.ndarray:
        """Scoring only (no routing update): predicted activations for
        layers >= from_layer from the sequence's current EAM. The
        speculative whole-step decoder uses this with from_layer=0 (or the
        first decoder layer) to warm the NEXT step across ALL its MoE
        layers — predict()'s score zeroes everything below the layer just
        recorded, which is right for within-step lookahead only."""
        current = self.tracer.get_entry(seq_id)
        matrix = self.tracer.find_most_similar(current.matrix, from_layer)
        matrix[:from_layer, :] = 0.0
        L = self.num_layers
        future = np.arange(from_layer, L, dtype=np.float32)
        decay = -(future - from_layer) / (L + 1) + 1.0  # [L - from_layer]
        matrix[from_layer:, :] = (
            matrix[from_layer:, :] + 1e-8
        ) * decay[:, None]
        return matrix
