"""Pure numpy sketch kernel — no Ray imports (see SURVEY.md §7.1)."""
