// JVM-side Unicode NFC normalization for architxt_spark.
//
// The one hot-path stage the engine otherwise runs through an Arrow
// pandas_udf (functions/text.py:nfc_normalize) — on a 100-TB curation
// run with unicode_clean=True this keeps normalization inside the JVM
// (no Arrow batch transfer, no Python workers).  Output contract is
// identical to Python's unicodedata.normalize("NFC", s): both JDK and
// CPython implement Unicode Standard Annex #15.
//
// Build + register (architxt_spark.jvm does both):
//   javac -cp spark-sql-api_*.jar ArchitxtNfcNormalize.java && jar it
//   spark.sql("ADD JAR <jar>")
//   spark.udf.registerJavaFunction("architxt_nfc", "ArchitxtNfcNormalize",
//                                  StringType())
// functions/text.py:nfc_normalize auto-detects the registered name and
// takes this path instead of the pandas_udf.
import java.text.Normalizer;
import org.apache.spark.sql.api.java.UDF1;

public class ArchitxtNfcNormalize implements UDF1<String, String> {
    @Override
    public String call(String s) {
        return s == null ? null : Normalizer.normalize(s, Normalizer.Form.NFC);
    }
}
