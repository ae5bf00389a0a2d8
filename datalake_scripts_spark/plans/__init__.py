"""Reference-parity pipeline definitions (SURVEY.md §7 phase 3).

Each module re-expresses one reference processor as a declarative set of
transforms over the shared normalization kit, producing the reference's
exact output tables (names + columns from its DDL / select blocks):

- :mod:`zoom`   — meetings / records / participants (zoom_proc.py)
- :mod:`monkey` — hst_surveys / _questions / _choices / _responses /
  _answers (monkey_proc.py)
- :mod:`vk`     — hst_groups / _contacts / _links / _members /
  _careers / _schools / _universities / hst_wall_items / _history
  (vk_proc.py)
- :mod:`jhub`   — jhublogs (jhub_proc.py)

Engine differences, on purpose: explicit input schemas (no inference
pass), one flatten projection per level (no repeated flat_df calls),
native regex instead of the row UDF, epoch/string timestamp casts via
functions.casts, and no out-of-band DDL channel.
"""

from . import zoom, monkey, vk, jhub, schemas  # noqa: F401
