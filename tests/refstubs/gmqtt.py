"""Import stub for the reference deepdish.py (gmqtt is not installed).

The parity tests never pass --mqtt-broker, so init_mqtt
(/root/reference/deepdish.py:667-680) never instantiates the client.
"""


class Client:
    def __init__(self, client_id):
        self.client_id = client_id

    def set_config(self, cfg):
        pass

    def set_auth_credentials(self, user, password):
        pass

    def publish(self, topic, payload):
        pass
