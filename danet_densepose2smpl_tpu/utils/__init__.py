"""Host-side utilities: visualization, timers."""
