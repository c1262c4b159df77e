package graft

/** Training-data pipeline operators for 100 TB-scale corpora, grouped by
  * the curation stage they serve. Everything is DataFrame-in /
  * DataFrame-out, shuffle-minimal (candidates-first joins, map-side
  * combined aggregates, broadcast small sides), and engineered for
  * bit-exact cross-engine reproducibility (see each object's parity
  * notes).
  *
  *  - '''Cleaning''': [[TextOps.stripMarkup]], [[Pii]] redaction,
  *    [[TextOps.repetitionStats]], [[TextOps.qualityScore]],
  *    [[TextOps.hashedClassifier]], [[TextOps.bigramLmScore]],
  *    [[TextOps.langId]].
  *  - '''Dedup''': [[Dedup.exact]], [[Dedup.minhashLsh]] +
  *    [[Dedup.clusters]], [[TextOps.simhash]], [[Spans]] (substring
  *    level), [[Clustering.semanticDedup]] (embedding level),
  *    [[Similarity]] near-dup variants.
  *  - '''Decontamination''': [[Decontam.contamination]] /
  *    [[Decontam.decontaminate]] (exact n-gram),
  *    [[Decontam.fuzzyContamination]] (signature level).
  *  - '''Search / ANN''': [[Search.bm25TopK]], [[Similarity.bruteTopK]],
  *    [[Similarity.ivfTopK]], [[Clustering.ivfLearnedTopK]],
  *    [[Clustering.pqTopK]] / [[Clustering.pqTopKRefined]].
  *  - '''Sampling & mixing''': [[Sampling.stratified]],
  *    [[Sampling.perStratumTopK]], [[Sampling.weightedTopK]],
  *    [[Sampling.temperatureMixRates]] / [[Sampling.temperatureMixSample]],
  *    [[Sampling.splitAssign]], [[Sampling.shuffleOrder]].
  *  - '''Training prep''': [[TextOps.chunkDocs]], [[Packing.packGreedy]],
  *    [[TextOps.vocabTopV]] / [[TextOps.oovStats]].
  *  - '''Corpus ops''': [[Dedup.corpusDiff]] (incremental),
  *    [[TextOps.corpusReport]], [[TextOps.topShingles]],
  *    [[Clustering.kmeans]] / [[Clustering.assignToCentroids]],
  *    [[Events]] (behavioral logs), [[Multimodal]] (binary columns).
  */
package object pipeline
