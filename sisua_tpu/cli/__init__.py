"""Command-line toolkits: sisua-train / sisua-evaluate / sisua-embed /
sisua-showdata (reference ``bin/`` + ``sisua/train.py``, ``evaluate.py``,
``showdata.py``). Run as modules:

  python -m sisua_tpu.cli.train model.name=vae dataset.name=synthetic
  python -m sisua_tpu.cli.evaluate -model vae -ds synthetic
  python -m sisua_tpu.cli.embed synthetic -o /tmp/embed
  python -m sisua_tpu.cli.showdata -ds synthetic -path /tmp/show
"""
