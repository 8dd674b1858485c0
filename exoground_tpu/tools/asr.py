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
        if self.task != "transcribe":
            # Whisper routes translate-vs-transcribe through generation
            # kwargs; without this the pipeline silently transcribes in the
            # source language (reference passes task to whisperx.transcribe,
            # transcribe_or_translate.py:95-101). Capability is decided by
            # SIGNATURE, not by catching TypeError around the call — that
            # would both mask genuine pipeline TypeErrors and silently
            # downgrade translate to transcribe on a retry.
            import inspect

            try:
                sig = inspect.signature(self._pipe)
                can_kw = any(
                    p.kind is inspect.Parameter.VAR_KEYWORD
                    or p.name == "generate_kwargs"
                    for p in sig.parameters.values()
                )
            except (TypeError, ValueError):
                can_kw = True  # uninspectable callables (HF pipelines): pass
            if not can_kw:
                raise RuntimeError(
                    f"task={self.task!r} requires a pipeline accepting "
                    "generate_kwargs; the injected pipeline_fn cannot "
                    "express it"
                )
            out = self._pipe(audio_path, generate_kwargs={"task": self.task})
        else:
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


class ForcedAligner:
    """Word-level forced alignment (reference transcribe_or_translate.py:
    102-107 and 180-184, the ``whisperx.align`` stage backed by a wav2vec2
    CTC model). The acoustic model is injected — weights cannot live here —
    but the alignment math itself is rebuilt: the standard CTC trellis +
    backtrack (CTC-segmentation style) in numpy.

    acoustic_fn(audio_path, start, end) -> (T, V) per-frame log-probs over
    a character vocabulary for that audio span. ``vocab`` maps characters to
    ids and must include ``word_sep`` (the inter-word token, wav2vec2's
    ``|``); ``blank_id`` is the CTC blank. ``frame_duration`` converts frame
    indices to seconds.
    """

    def __init__(
        self,
        acoustic_fn: Callable[[str, float, float], "object"],
        vocab: Dict[str, int],
        frame_duration: float = 0.02,
        blank_id: int = 0,
        word_sep: str = "|",
    ):
        self.acoustic_fn = acoustic_fn
        self.vocab = vocab
        self.frame_duration = frame_duration
        self.blank_id = blank_id
        self.word_sep = word_sep

    def _tokenize(self, text: str):
        """Transcript -> (char list, id list): lowercase, spaces to the word
        separator, characters outside the vocab dropped (whisperx's
        clean-char preprocessing)."""
        chars, ids = [], []
        for ch in " ".join(str(text).lower().split()):
            ch = self.word_sep if ch == " " else ch
            if ch in self.vocab:
                chars.append(ch)
                ids.append(self.vocab[ch])
        return chars, ids

    def align_segment(self, audio_path: str, segment: Dict) -> Optional[List[Dict]]:
        """One ASR segment -> [{'word','start','end','score'}, ...] with
        absolute times, or None when unalignable (empty transcript / audio
        span shorter than the token sequence — whisperx's fallback case)."""
        import numpy as np

        chars, tokens = self._tokenize(segment["text"])
        if not tokens:
            return None
        start, end = float(segment["start"]), float(segment["end"])
        emissions = np.asarray(self.acoustic_fn(audio_path, start, end), np.float64)
        t_frames, _ = emissions.shape
        n = len(tokens)
        if t_frames < n:
            return None
        # defensively renormalize to log-probs
        emissions = emissions - _logsumexp(emissions, axis=-1, keepdims=True)

        # CTC trellis: best log-prob of consuming the first j tokens within
        # the first t frames (stay = emit blank, advance = emit token j)
        neg = -1e18
        trellis = np.full((t_frames + 1, n + 1), neg)
        trellis[0, 0] = 0.0
        trellis[1:, 0] = np.cumsum(emissions[:, self.blank_id])
        tok_arr = np.asarray(tokens)
        for t in range(1, t_frames + 1):
            stay = trellis[t - 1, 1:] + emissions[t - 1, self.blank_id]
            advance = trellis[t - 1, :-1] + emissions[t - 1, tok_arr]
            trellis[t, 1:] = np.maximum(stay, advance)
        if trellis[-1, -1] <= neg / 2:
            return None

        # backtrack: the frame at which each token was emitted
        frames = np.zeros(n, np.int64)
        scores = np.zeros(n)
        j = n
        t = t_frames
        while j > 0 and t > 0:
            advance = trellis[t - 1, j - 1] + emissions[t - 1, tok_arr[j - 1]]
            stay = trellis[t - 1, j] + emissions[t - 1, self.blank_id]
            if advance >= stay:
                j -= 1
                frames[j] = t - 1
                scores[j] = np.exp(emissions[t - 1, tok_arr[j]])
            t -= 1
        if j > 0:  # no valid monotonic path
            return None

        words: List[Dict] = []
        buf, f0, f1, sc = "", None, None, []
        for ch, fr, s in zip(chars, frames, scores):
            if ch == self.word_sep:
                if buf:
                    words.append(self._word(buf, f0, f1, sc, start))
                buf, f0, f1, sc = "", None, None, []
            else:
                buf += ch
                f0 = fr if f0 is None else f0
                f1 = fr
                sc.append(s)
        if buf:
            words.append(self._word(buf, f0, f1, sc, start))
        return words

    def _word(self, word, f0, f1, scores, offset):
        import numpy as np

        return {
            "word": word,
            "start": offset + float(f0) * self.frame_duration,
            "end": offset + (float(f1) + 1) * self.frame_duration,
            "score": float(np.mean(scores)) if scores else 0.0,
        }

    def __call__(self, audio_path: str, segments: List[Dict]) -> List[Dict]:
        """Attach 'words' to every alignable segment (in place + returned)."""
        for seg in segments:
            words = self.align_segment(audio_path, seg)
            if words:
                seg["words"] = words
        return segments


def _logsumexp(x, axis=-1, keepdims=False):
    import numpy as np

    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis=axis)


def flatten_words(segments: List[Dict]):
    """Segments (with optional aligned 'words') -> per-word
    (caps, starts, ends) for Sentencify.punctuate_and_cut: aligned words give
    exact per-word spans (the reference pipeline's precision — whisperx word
    times feeding filters/sentencify.py:53-63 interpolation); segments
    without words fall back to one segment-level caption whose token times
    interpolate uniformly."""
    caps: List[str] = []
    starts: List[float] = []
    ends: List[float] = []
    for seg in segments:
        if seg.get("words"):
            for w in seg["words"]:
                caps.append(w["word"])
                starts.append(float(w["start"]))
                ends.append(float(w["end"]))
        else:
            caps.append(seg["text"])
            starts.append(float(seg["start"]))
            ends.append(float(seg["end"]))
    return caps, starts, ends


def transcribe_or_translate(
    audio_path: str,
    language: str = "en",
    asr: Optional[WhisperASR] = None,
    translate_fn: Optional[Callable[[List[str]], List[str]]] = None,
    aligner: Optional[ForcedAligner] = None,
) -> List[Dict]:
    """Transcribe (+ forced word alignment), non-English routed through
    ``translate_fn`` (reference transcribe_or_translate.py:72-213: whisperx
    transcribe -> align -> m2m100). Mirroring the reference's output contract
    (:188-198): translated segments DROP word-level times ('words' describes
    the native transcript, kept under 'text_native'/'words_native')."""
    if asr is None:
        raise RuntimeError("pass a WhisperASR instance (no ASR weights baked in)")
    segs = asr.transcribe(audio_path)
    if aligner is not None:
        segs = aligner(audio_path, segs)
    if language != "en" and translate_fn is not None:
        texts = translate_fn([s["text"] for s in segs])
        for s, t in zip(segs, texts):
            s["text_native"] = s["text"]
            s["text"] = t
            if "words" in s:
                s["words_native"] = s.pop("words")
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
