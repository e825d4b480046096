"""Gradio web demo (capability parity: inference/svs/gradio/infer.py).

Sentence-split batching by CJK punctuation, int16 concatenation with 0.3 s
gaps. Gradio itself is optional in this image; the splitting/synthesis logic is
importable and tested without it.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

PUNCS = "。？；："


def split_sentences(text: str, notes: str, notes_duration: str
                    ) -> List[Tuple[str, str, str]]:
    """Split aligned (text, notes, durations) on CJK sentence punctuation,
    batching up to ~400 chars (reference gradio/infer.py:25-56)."""
    sents = re.split(rf"([{PUNCS}])", text.replace("\n", ","))
    sents_notes = re.split(rf"([{PUNCS}])", notes.replace("\n", ","))
    sents_dur = re.split(rf"([{PUNCS}])", notes_duration.replace("\n", ","))
    if sents[-1] not in list(PUNCS):
        sents += [""]
        sents_notes += [""]
        sents_dur += [""]
    chunks = []
    s = n = d = ""
    for i in range(0, len(sents), 2):
        if len(sents[i]) > 0:
            s += sents[i] + sents[i + 1]
            n += sents_notes[i] + sents_notes[i + 1]
            d += sents_dur[i] + sents_dur[i + 1]
        if len(s) >= 400 or (i >= len(sents) - 2 and len(s) > 0):
            chunks.append((s, n, d))
            s = n = d = ""
    return chunks


class GradioInfer:
    def __init__(self, hp: Dict, inference_cls, title: str = "DiffSinger-TPU",
                 description: str = "", article: str = "", example_inputs=()):
        self.hp = hp
        self.title = title
        self.description = description
        self.article = article
        self.example_inputs = list(example_inputs)
        self.infer_ins = inference_cls(hp)

    def greet(self, text: str, notes: str, notes_duration: str):
        sr = self.hp["audio_sample_rate"]
        audio_outs = []
        for s, n, d in split_sentences(text, notes, notes_duration):
            wav = self.infer_ins.infer_once(
                {"text": s, "notes": n, "notes_duration": d})
            wav = np.clip(np.nan_to_num(np.asarray(wav)), -1.0, 1.0)
            audio_outs.append((wav * 32767).astype(np.int16))
            audio_outs.append(np.zeros(int(sr * 0.3), np.int16))
        return sr, np.concatenate(audio_outs)

    def run(self, **launch_kwargs):
        try:
            import gradio as gr
        except ImportError as e:
            raise ImportError("gradio is not installed in this image") from e
        iface = gr.Interface(
            fn=self.greet,
            inputs=[gr.Textbox(label="Input Text"),
                    gr.Textbox(label="Input Note"),
                    gr.Textbox(label="Input Duration")],
            outputs=gr.Audio(label="Output Audio"),
            title=self.title, description=self.description, article=self.article,
            examples=self.example_inputs, allow_flagging="never")
        iface.launch(**launch_kwargs)
