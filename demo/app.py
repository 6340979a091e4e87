"""Gradio text-to-video demo UI (reference: demo/app.py:1-80).

Serves Text2Video/Video2Video behind a simple web UI. Falls back to the
stub backend (demo_test.py) when no snapshot/models are available —
mirroring the reference's import toggle (demo/app.py:5-8).
"""

from __future__ import annotations

import os
import sys

try:
    from demo.t2v import Text2Video, Video2Video, save_video

    _BACKEND = "real"
except Exception:  # pragma: no cover
    from demo.demo_test import Text2Video, Video2Video  # type: ignore

    _BACKEND = "stub"


def build_app(snapshot_dir=None, task="stickman_walk"):
    import gradio as gr

    if _BACKEND == "real" and snapshot_dir:
        t2v = Text2Video(snapshot_dir, task=task)
        v2v = Video2Video(snapshot_dir, task=task)
    else:
        from demo.demo_test import Text2Video as T, Video2Video as V

        t2v, v2v = T(), V()

    def text_fn(prompt, duration):
        out = "/tmp/genrl_t2v.mp4"
        t2v.get_prompt(prompt, int(duration), out_path=out)
        return out

    def video_fn(video, duration):
        out = "/tmp/genrl_v2v.mp4"
        v2v.get_video(video, int(duration), out_path=out)
        return out

    with gr.Blocks(title="GenRL-TPU text2video") as app:
        gr.Markdown("# GenRL-TPU — imagined video from language / video prompts")
        with gr.Tab("Text prompt"):
            prompt = gr.Textbox(value="robot walk fast clean", label="prompt")
            duration = gr.Slider(8, 64, value=16, step=8, label="frames")
            btn = gr.Button("Imagine")
            out = gr.Video()
            btn.click(text_fn, [prompt, duration], out)
        with gr.Tab("Video prompt"):
            vid = gr.Video(label="prompt video")
            duration2 = gr.Slider(8, 64, value=16, step=8, label="frames")
            btn2 = gr.Button("Imagine")
            out2 = gr.Video()
            btn2.click(video_fn, [vid, duration2], out2)
    return app


if __name__ == "__main__":
    snapshot_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get("GENRL_SNAPSHOT")
    build_app(snapshot_dir).launch()
