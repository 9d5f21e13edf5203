"""Find the longest WAV inside a tar/tar.gz archive (reference: wavmax.py).

Dataset utility for sizing the codec's max_seq_len against the corpus.
(Despite external metadata suggestions, this is NOT a vocoder — waveform
reconstruction goes through the codec decoder; SURVEY §2 #14.)

CLI: python -m mamba_tts_tpu.tools.wavmax archive.tar.gz
"""
from __future__ import annotations

import argparse
import io
import tarfile
from typing import Optional, Tuple

from mamba_tts_tpu.audio.wavio import read_wav


def longest_wav_in_tar(tar_path: str) -> Tuple[Optional[str], float]:
    max_len = 0.0
    max_name = None
    with tarfile.open(tar_path, "r:*") as tf:
        for member in tf.getmembers():
            if not member.name.lower().endswith(".wav"):
                continue
            f = tf.extractfile(member)
            if f is None:
                continue
            wav, sr = read_wav(f.read())
            duration = wav.shape[0] / sr
            if duration > max_len:
                max_len = duration
                max_name = member.name
    return max_name, max_len


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Find longest WAV file inside a .tar/.tar.gz archive."
    )
    parser.add_argument("archive", help="Path to tar or tar.gz file")
    args = parser.parse_args(argv)
    fname, length = longest_wav_in_tar(args.archive)
    if fname is None:
        print("No WAV files found.")
    else:
        print(f"Longest file: {fname}")
        print(f"Duration: {length:.3f} seconds")


if __name__ == "__main__":
    main()
