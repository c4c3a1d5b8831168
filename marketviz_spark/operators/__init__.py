"""Pure DataFrame -> DataFrame operator functions mirroring SURVEY §2."""
