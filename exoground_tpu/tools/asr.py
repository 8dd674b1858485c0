"""ASR tooling: language detection + transcribe/translate (htm_zoo rebuild).

Reference htm_zoo/whisperx/: language_detect.py (Whisper large-v2 language
id over a 30 s snippet) and transcribe_or_translate.py:72-213 (WhisperX
transcribe with word-level alignment; non-English routed through m2m100
translation). Offline host tooling: heavyweight model weights are not baked
into this environment, so both entry points accept injected model callables
and raise a clear error when neither models nor weights are available.

Output format matches the reference's downstream contract — a list of
segments {'text', 'start', 'end'} per video, the input to
tools/sentencify.process_corpus.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional


class WhisperASR:
    """transcribe(audio_path) -> [{'text','start','end'}, ...].

    model_id: any HF Whisper checkpoint directory/id available locally
    (reference uses large-v2). ``pipeline_fn`` injects a ready callable for
    tests or alternative backends.
    """

    def __init__(
        self,
        model_id: str = "",
        pipeline_fn: Optional[Callable] = None,
        task: str = "transcribe",
    ):
        self.task = task
        self._pipe = pipeline_fn
        if self._pipe is None and model_id:
            try:
                from transformers import pipeline

                self._pipe = pipeline(
                    "automatic-speech-recognition", model=model_id,
                    return_timestamps=True,
                )
            except Exception as e:
                raise RuntimeError(
                    f"Whisper weights unavailable ({e}); pass pipeline_fn or "
                    "run in an environment with the model downloaded"
                ) from e
        if self._pipe is None:
            raise RuntimeError(
                "WhisperASR needs model_id or pipeline_fn (no ASR weights baked in)"
            )

    def transcribe(self, audio_path: str) -> List[Dict]:
        out = self._pipe(audio_path)
        chunks = out.get("chunks") or out.get("segments") or []
        segs = []
        for c in chunks:
            ts = c.get("timestamp") or (c.get("start"), c.get("end"))
            if ts[0] is None:
                continue
            segs.append({
                "text": str(c.get("text", "")).strip(),
                "start": float(ts[0]),
                "end": float(ts[1] if ts[1] is not None else ts[0]),
            })
        return segs


def detect_language(
    audio_path: str,
    detector_fn: Optional[Callable[[str], str]] = None,
    text_probe: Optional[List[str]] = None,
) -> str:
    """Language id for a video/audio file (reference language_detect.py).

    detector_fn: injected model (audio -> ISO code). Fallback: if an ASR text
    probe is supplied, score it with the sentencify English heuristic."""
    if detector_fn is not None:
        return detector_fn(audio_path)
    if text_probe:
        from exoground_tpu.tools.sentencify import english_score

        import numpy as np

        score = float(np.mean([english_score(t) for t in text_probe]))
        return "en" if score > 0.5 else "unknown"
    raise RuntimeError("detect_language needs detector_fn or text_probe")


def transcribe_or_translate(
    audio_path: str,
    language: str = "en",
    asr: Optional[WhisperASR] = None,
    translate_fn: Optional[Callable[[List[str]], List[str]]] = None,
) -> List[Dict]:
    """Transcribe; non-English text is routed through ``translate_fn``
    (reference transcribe_or_translate.py:72-213, m2m100 stage)."""
    if asr is None:
        raise RuntimeError("pass a WhisperASR instance (no ASR weights baked in)")
    segs = asr.transcribe(audio_path)
    if language != "en" and translate_fn is not None:
        texts = translate_fn([s["text"] for s in segs])
        for s, t in zip(segs, texts):
            s["text"] = t
    return segs


def save_asr_json(segments_by_vid: Dict[str, List[Dict]], out_path: str):
    """Write the {vid: {'text','start','end'}} json the data layer consumes."""
    out = {
        vid: {
            "text": [s["text"] for s in segs],
            "start": [s["start"] for s in segs],
            "end": [s["end"] for s in segs],
        }
        for vid, segs in segments_by_vid.items()
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out_path
