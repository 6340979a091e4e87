"""Dataset embedder CLI: add InternVideo2 `clip_video` embeddings to episodes.

Rebuild of the reference embedder (process_dataset.py:26-140): walks a
directory of `.npz` episodes, computes per-frame sliding-window video
embeddings and writes them back under `clip_video`, with advisory file
locking so multiple workers can share a directory.

    python process_dataset.py dataset_dir=data/stickman_example

TPU-native: windows are batched and embedded on-TPU (on-device resize +
normalize + flash-attention ViT), replacing the reference's per-chunk
torchvision+CUDA pipeline.
"""

from __future__ import annotations

import io
import os
import sys
from pathlib import Path

import numpy as np


class Locker:
    """Advisory lock via a sidecar .lock file (reference:
    process_dataset.py:26-59, fcntl flavor)."""

    def __init__(self, path: Path):
        self.lock_path = Path(str(path) + ".lock")
        self._fd = None

    def __enter__(self):
        import fcntl

        self._fd = open(self.lock_path, "w")
        try:
            fcntl.flock(self._fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            return True
        except OSError:
            self._fd.close()
            self._fd = None
            return False

    def __exit__(self, *args):
        import fcntl

        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            self._fd.close()
            try:
                self.lock_path.unlink()
            except OSError:
                pass


class Workspace:
    def __init__(self, cfg):
        self.cfg = cfg
        from genrl_tpu.models.internvideo2 import get_global_instance

        mesh = None
        mesh_cfg = dict(cfg.get("mesh", {}))
        if int(mesh_cfg.get("model", 1)) > 1:
            # TP config path for the ViT tower (SURVEY §2.10): shards qkv/fc1
            # column- and proj/fc2 row-parallel over the `model` mesh axis
            from genrl_tpu.parallel import make_mesh

            mesh = make_mesh(**mesh_cfg)
        self.clip = get_global_instance(cfg.get("viclip_model", "internvideo2"),
                                        models_root=cfg.get("models_root", "models"),
                                        mesh=mesh)
        from genrl_tpu.envs.viclip_wrapper import ViClipWrapper

        # reuse the wrapper's episode processor without an env behind it
        self._processor = ViClipWrapper.__new__(ViClipWrapper)
        self._processor.clip = self.clip
        self._processor.n_frames = self.clip.n_frames
        self._processor.viclip_emb_dim = self.clip.viclip_emb_dim
        self._processor.accumulate = False
        self._processor.accumulate_buffer = []
        self._processor.hd_rendering = False

    @staticmethod
    def _write_episode(path: Path, episode, errbox):
        """Compress to a sidecar tmp and os.replace() into place so a failed
        or interrupted write can never truncate the source episode; any
        exception is captured for flush() to re-raise (a bare daemon-thread
        failure would otherwise leave the episode silently unprocessed while
        the run counts it as done)."""
        try:
            tmp = path.with_name(path.name + ".tmp")
            with io.BytesIO() as bs:
                np.savez_compressed(bs, **episode)
                bs.seek(0)
                with tmp.open("wb") as f:
                    f.write(bs.read())
            os.replace(tmp, path)
        except BaseException as e:  # noqa: BLE001 — relayed to the main thread
            errbox.append(e)

    def process(self):
        import threading

        from genrl_tpu.data.replay import load_episode

        cfg = self.cfg
        dataset_dir = Path(cfg.dataset_dir)
        assert dataset_dir.exists(), dataset_dir
        paths = sorted(dataset_dir.glob("**/*.npz"))
        done = skipped = 0
        # one write in flight: episode k compresses on the host while episode
        # k+1 embeds on the device (npz gzip of a 500-frame episode costs
        # seconds of host CPU — serial, it stalls the accelerator). The lock
        # is held until the write lands, so other workers still skip safely.
        pending = None  # (thread, locker, errbox)

        def flush():
            nonlocal pending
            if pending is not None:
                thread, locker, errbox = pending
                thread.join()
                locker.__exit__()
                pending = None
                if errbox:
                    raise RuntimeError("episode write failed") from errbox[0]

        for path in paths:
            locker = Locker(path)
            if not locker.__enter__():
                skipped += 1
                continue
            keep_lock = False
            try:
                episode = load_episode(path)
                if cfg.get("skip_existing", True) and "clip_video" in episode:
                    skipped += 1
                    continue
                obs = episode["observation"]  # [T, C, H, W] uint8
                embeds = self._processor.process_episode(
                    obs, process_at_once=int(cfg.get("batch_windows", 8)))
                episode["clip_video"] = embeds.astype(np.float32)
                flush()
                errbox = []
                thread = threading.Thread(
                    target=self._write_episode, args=(path, episode, errbox))
                thread.start()
                pending = (thread, locker, errbox)
                keep_lock = True
                done += 1
                print(f"processed {path.name}: clip_video {embeds.shape}")
            finally:
                if not keep_lock:
                    locker.__exit__()
        flush()
        print(f"done: {done} processed, {skipped} skipped")
        return done, skipped


def main(argv=None):
    from genrl_tpu.configs import PRESETS, PROCESS_BASE
    from genrl_tpu.parallel import honor_platform_env
    from genrl_tpu.utils.config import compose

    honor_platform_env()
    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(PRESETS, PROCESS_BASE, argv)
    Workspace(cfg).process()


if __name__ == "__main__":
    main()
