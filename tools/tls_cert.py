"""Self-signed TLS certificate generation for the in-repo Kafka TLS
stand — the dependency-light analog of the reference's dev TLS
keystore generation (`/root/reference/dev/kafka-tls/` generates broker
certs with openssl; this uses the `cryptography` package so the test
suite needs no subprocess).

TEST INFRASTRUCTURE ONLY: a production deployment brings its own CA.
"""

from __future__ import annotations

import datetime
import ipaddress
from pathlib import Path


def generate_self_signed(
    out_dir: str | Path, common_name: str = "127.0.0.1"
) -> tuple[str, str]:
    """Write ``cert.pem`` + ``key.pem`` under ``out_dir`` for a broker
    listening on 127.0.0.1/localhost. -> (cert_path, key_path). The
    cert doubles as its own CA bundle (self-signed), matching how
    `config.py kafka_security_options` treats ``tls_ca_location`` as a
    PEM truststore."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, common_name)]
    )
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=365))
        .add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.DNSName("localhost"),
                    x509.IPAddress(ipaddress.IPv4Address("127.0.0.1")),
                ]
            ),
            critical=False,
        )
        .add_extension(
            x509.BasicConstraints(ca=True, path_length=None), critical=True
        )
        .sign(key, hashes.SHA256())
    )
    cert_path = out / "cert.pem"
    key_path = out / "key.pem"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    return str(cert_path), str(key_path)
