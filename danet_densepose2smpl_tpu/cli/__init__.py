"""CLI entry points: demo / eval / eval_coco / train (reference flag parity)."""
