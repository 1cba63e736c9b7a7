"""Sources: every reference extractor family re-expressed as a DataFrame
producer. File/catalog sources read natively; DB metadata extractors become
a JDBC dialect-SQL catalog; API extractors become driver-side fetch -> DF
with the fetch loop isolated in one function; Kafka becomes Structured
Streaming (streaming/)."""
