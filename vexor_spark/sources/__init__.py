"""Sources: synthetic Common-Crawl-style pages corpus + table IO."""
