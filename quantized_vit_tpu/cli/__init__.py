"""Command-line drivers mirroring the reference entry points.

- ``python -m quantized_vit_tpu.cli.train``   — QAT + pruning training
  (QViT_with_GETA/train.py:621-701 / train_geta_test.py:662-747)
- ``python -m quantized_vit_tpu.cli.eval``    — test-set top-1/top-5
  (RESULT_TEST.py)
- ``python -m quantized_vit_tpu.cli.predict`` — single-image inference
  (predict.py)
- ``python -m quantized_vit_tpu.cli.export``  — artifact export
  (torch_export.py + ultranet_param_gen.py analogue, plus ViT INT4)
- ``python -m quantized_vit_tpu.cli.serve``   — INT4 serving loop with
  continuous batching (no reference analogue; BASELINE.md config 5)
"""
