"""Host-side utilities: ids, warnings, errors."""
