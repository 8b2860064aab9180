"""The reference's clinical domain, re-expressed Spark-first.

Modules map 1:1 to the reference's described application layer
(reference README.md:15-39):

- ``schemas``  : explicit StructTypes for the entity/KB tables (R:7-8)
- ``fixtures`` : deterministic synthetic seed data (the bootstrap script
                 shape, R:36,55-58,75)
- ``ingest``   : HL7 v2 segment parsing + FHIR bundle parsing (R:3,76)
- ``rules``    : therapeutic overlap (R:23), generic substitution (R:24),
                 payer/formulary alignment (R:25)
- ``scoring``  : denial-risk logistic (R:9,27,77) — reuses
                 functions.scoring.logistic_score
- ``fhir``     : draft MedicationRequest export (R:10,29,71)
"""
