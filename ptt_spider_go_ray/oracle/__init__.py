"""Plain-Python oracles shipped WITH the package (not under tests/) so the
driver contract (`oracle_sql()` builds derived VALUES literals from the
crawl replay) works in a deployment that ships only the package."""
