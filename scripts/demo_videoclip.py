"""Check the InternVideo2 component: embed a video + candidate texts, print
similarity ranking (reference: notebooks/demo_videoclip.ipynb).

    python scripts/demo_videoclip.py <video.mp4> "text one" "text two" ...
"""

import sys

import numpy as np


def main():
    video_path = sys.argv[1]
    texts = sys.argv[2:] or ["robot walk fast clean", "lying down", "doing flips"]
    from genrl_tpu.models.internvideo2 import get_global_instance

    clip = get_global_instance()
    vfeat = clip.get_vid_features_from_file(video_path)
    scores = {}
    for t in texts:
        tfeat = clip.get_txt_feat(t)
        scores[t] = float(np.dot(vfeat, tfeat))
    for t, s in sorted(scores.items(), key=lambda kv: -kv[1]):
        print(f"{s:+.4f}  {t}")


if __name__ == "__main__":
    main()
