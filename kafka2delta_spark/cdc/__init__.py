"""CDC decode/apply layer: Confluent wire format, Avro decode, Debezium
type casting, latest-per-key dedup, and MERGE-equivalent state application."""
