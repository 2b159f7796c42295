"""Image-text pair dataset over TSV shards (the RegionCLIP pretraining
corpus; reference detectron2/data/clip_datasets/clip_img_txt_pair_tsv.py:29
CLIPImgTxtPairTSVDataset + build.py:312-340 make_clip_dataset branch).

Rows are `key\\tbase64_jpeg` in the image TSV and `key\\tcaption(s)` in the
text TSV; shards pair 1:1. Yields (image_uint8 HWC, caption str)."""

import base64
import io
import json
import logging
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..structures.tsv_file import TSVFile

logger = logging.getLogger(__name__)


class CLIPImgTxtPairTSVDataset:
    def __init__(
        self,
        image_tsv_files: Sequence[str],
        text_tsv_files: Sequence[str],
    ):
        assert len(image_tsv_files) == len(text_tsv_files)
        self.image_tsvs = [TSVFile(f) for f in image_tsv_files]
        self.text_tsvs = [TSVFile(f) for f in text_tsv_files]
        self._sizes = [len(t) for t in self.image_tsvs]
        for it, tt in zip(self.image_tsvs, self.text_tsvs):
            assert len(it) == len(tt), "image/text TSV shard length mismatch"
        self._cum = np.cumsum([0] + self._sizes)

    def __len__(self) -> int:
        return int(self._cum[-1])

    def _locate(self, idx: int) -> Tuple[int, int]:
        shard = int(np.searchsorted(self._cum, idx, side="right") - 1)
        return shard, idx - int(self._cum[shard])

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        shard, row = self._locate(idx)
        img_row = self.image_tsvs[shard][row]
        txt_row = self.text_tsvs[shard][row]
        img = np.asarray(Image.open(io.BytesIO(base64.b64decode(img_row[-1]))).convert("RGB"))
        cap = txt_row[-1]
        try:  # captions may be a JSON dict/list (reference tolerates both)
            parsed = json.loads(cap)
            if isinstance(parsed, dict):
                caps = parsed.get("captions", [cap])
                cap = caps[0] if caps else ""
            elif isinstance(parsed, list):
                cap = parsed[0] if parsed else ""
        except (json.JSONDecodeError, TypeError):
            pass
        return img, str(cap)

    def batches(
        self, batch_size: int, image_size: int = 224, seed: int = 0, epochs: Optional[int] = None
    ) -> Iterator[Tuple[np.ndarray, List[str]]]:
        """Infinite (or epochs-bounded) stream of (images (B,S,S,3) uint8,
        captions list)."""
        rng = np.random.RandomState(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(self))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                imgs, caps = [], []
                for j in order[i : i + batch_size]:
                    img, cap = self[int(j)]
                    pil = Image.fromarray(img).resize((image_size, image_size), Image.BICUBIC)
                    imgs.append(np.asarray(pil))
                    caps.append(cap)
                yield np.stack(imgs), caps
            epoch += 1
