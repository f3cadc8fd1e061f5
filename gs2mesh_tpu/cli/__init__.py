"""Dataset drivers and preprocessors (the reference's root scripts)."""
