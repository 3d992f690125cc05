"""Frozen CLIP text encoder (host-side preprocessing).

Parity with reference src/models/clip_text.py (CLIPTextEncoder :18): pooled
text embeddings from a frozen CLIP. On TPU this is a data-prep concern —
the baked-in torch-CPU `transformers` runs at cache-build time and the
trainers consume the stored embeddings; nothing CLIP touches the
accelerator path.
"""
from __future__ import annotations

from typing import List, Optional

import numpy as np


class CLIPTextEncoder:
    def __init__(self, model_name: str = "openai/clip-vit-base-patch32",
                 device: str = "cpu"):
        try:
            import torch
            from transformers import CLIPTextModel, CLIPTokenizer
        except ImportError as e:  # pragma: no cover
            raise ImportError("CLIPTextEncoder needs transformers+torch "
                              "(host-side prep only)") from e
        self._torch = torch
        self.tokenizer = CLIPTokenizer.from_pretrained(model_name)
        self.model = CLIPTextModel.from_pretrained(model_name).to(device).eval()
        self.device = device
        self.text_dim = int(self.model.config.hidden_size)

    def encode(self, texts: List[str], pooled: bool = True,
               max_length: Optional[int] = None) -> np.ndarray:
        torch = self._torch
        tok = self.tokenizer(
            texts, padding="max_length", truncation=True,
            max_length=max_length or self.tokenizer.model_max_length,
            return_tensors="pt",
        ).to(self.device)
        with torch.no_grad():
            out = self.model(**tok)
        if pooled:
            return out.pooler_output.cpu().numpy().astype(np.float32)
        return out.last_hidden_state.cpu().numpy().astype(np.float32)
