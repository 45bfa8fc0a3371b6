"""Sources and sinks (SURVEY §2.1 S1-S7, §2.2 K1-K10)."""
